"""The compact-sort widening scatter (`_spread_word`) is built from an
exact numpy routing simulation with collision asserts; verify the
resulting stage masks implement ``out[b*Np] = in[b]`` for every layout
class the kernel can request, by replaying the stages in numpy exactly
as the kernel does (MSB->LSB right rolls + dest-mask selects)."""

import numpy as np
import pytest

from demcmc_tpu.ops.fused_step import _R, _spread_word


@pytest.mark.parametrize("Gr,Np", [
    (128, 4), (128, 16), (256, 8), (512, 16), (1024, 16),
    (128, 6), (256, 12),              # non-power-of-two Np
])
def test_spread_word_scatters_exactly(Gr, Np):
    Cf = Gr * Np
    T, word = _spread_word(Gr, Np, Cf)
    assert word.shape == (_R, Cf)
    rng = np.random.default_rng(Gr + Np)
    row = rng.standard_normal(Cf).astype(np.float32)
    row[Gr:] = 0.0                         # the lane-concat zero padding
    y = row.copy()
    w = word[0]
    for t in range(T - 1, -1, -1):
        take = ((w >> t) & 1) == 1
        y = np.where(take, np.roll(y, 1 << t), y)
    # leader lanes hold the scattered values
    np.testing.assert_array_equal(y[np.arange(Gr) * Np], row[:Gr])


def test_spread_word_rejects_nothing_in_range():
    # every power-of-two Gr the sampler can produce builds cleanly
    for Gr in (128, 256, 512, 1024, 2048):
        for Np in (3, 4, 8, 16, 32, 64):
            _spread_word(Gr, Np, Gr * Np)
