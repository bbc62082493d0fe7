from . import (abc_kde, binomial, gaussian, hierarchical, lba, lnr, mvnormal,
               rastrigin)

__all__ = ["abc_kde", "binomial", "gaussian", "hierarchical", "lba", "lnr",
           "mvnormal", "rastrigin"]
