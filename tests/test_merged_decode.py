"""Merged-decoder-scan equivalence: one scan for all T-length heads must be
bit-identical (up to float assoc) to per-head scans."""

import numpy as np
import jax
import pytest

from midi_vae_tpu.config import small_test_config
from midi_vae_tpu.models import MidiVAE


@pytest.mark.parametrize("extra", [{}, {"meta_held_notes": True, "meta_next_notes": True}])
def test_merged_equals_separate(extra):
    cfg_m = small_test_config(merge_decoder_scans=True, **extra)
    cfg_s = small_test_config(merge_decoder_scans=False, **extra)
    model_m = MidiVAE(cfg_m)
    model_s = MidiVAE(cfg_s)
    params = model_m.init_params(jax.random.PRNGKey(0))
    z = np.random.RandomState(0).randn(3, cfg_m.latent_dim).astype(np.float32)
    out_m = model_m.decode(params, z)
    out_s = model_s.decode(params, z)
    assert set(out_m) == set(out_s)
    for name in out_m:
        np.testing.assert_allclose(
            np.asarray(out_m[name][0]), np.asarray(out_s[name][0]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
