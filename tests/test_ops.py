"""Pallas kernel tests: fused GRU step vs the pure cells.py math.

On CPU the kernels run in interpret mode -- the same Mosaic lowering paths
are exercised numerically; the TPU compiled path is covered by bench.py and
the driver's real-chip runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from midi_vae_tpu.models.cells import GRUCell
from midi_vae_tpu.ops import fused_gru


@pytest.fixture
def gru_data():
    rng = np.random.RandomState(0)
    B, D, H = 8, 16, 32
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H).astype(np.float32))
    params = GRUCell.init(jax.random.PRNGKey(0), D, H)
    return x, h, params


class TestFusedGRU:
    def test_full_step_matches_cell(self, gru_data):
        x, h, p = gru_data
        expected, _ = GRUCell.step(p, GRUCell.x_proj(p, x), (h,), jnp.tanh)
        got = fused_gru.gru_step(x, h, p["w"], p["u"], p["b"], interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-6)

    def test_recurrent_step_matches_cell(self, gru_data):
        x, h, p = gru_data
        xp = GRUCell.x_proj(p, x)
        expected, _ = GRUCell.step(p, xp, (h,), jnp.tanh)
        got = fused_gru.gru_recurrent_step(xp, h, p["u"], interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-6)

    def test_fallback_matches_kernel(self, gru_data):
        x, h, p = gru_data
        interp = fused_gru.gru_step(x, h, p["w"], p["u"], p["b"], interpret=True)
        fallback = fused_gru._gru_step_reference(x, h, p["w"], p["u"], p["b"], jnp.tanh)
        np.testing.assert_allclose(np.asarray(interp), np.asarray(fallback), rtol=2e-5, atol=2e-6)

    def test_decoder_step_adapter(self, gru_data):
        x, h, p = gru_data
        step = fused_gru.make_fused_decoder_step("tanh")
        out, (new_h,) = step(p, x, (h,))
        expected, _ = GRUCell.step(p, GRUCell.x_proj(p, x), (h,), jnp.tanh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-6)
        assert out is new_h

    def test_reference_scale_shapes(self):
        """Reference dims: B=256, D=61, H=256 -- must fit the VMEM budget."""
        assert fused_gru._fits_vmem(256, 61, 256)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(256, 61).astype(np.float32))
        h = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        p = GRUCell.init(jax.random.PRNGKey(1), 61, 256)
        got = fused_gru.gru_step(x, h, p["w"], p["u"], p["b"], interpret=True)
        expected, _ = GRUCell.step(p, GRUCell.x_proj(p, x), (h,), jnp.tanh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=1e-5)


class TestFusedDecoderScan:
    def test_matches_reference_2layer(self):
        from midi_vae_tpu.models.cells import GRUCell, dense_init
        from midi_vae_tpu.ops import fused_decoder as fd

        B, D, H, T = 4, 12, 16, 6
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        cells = [GRUCell.init(ks[0], D, H), GRUCell.init(ks[1], H, H)]
        out_dense = dense_init(ks[2], H, D)
        rng = np.random.RandomState(0)
        states = [jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1 for _ in range(2)]
        start = jnp.zeros((B, D), jnp.float32)
        ref = fd._decode_scan_reference(
            cells, out_dense, states, start, T,
            fd._activation("tanh"), fd._out_act_fn("softmax"),
        )
        got = fd.fused_decode_scan(cells, out_dense, states, start, T,
                                   "tanh", "softmax", True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=2e-5, atol=2e-6)

    def test_inference_decode_matches_training_decode(self):
        """The whole-scan inference path must equal the training decode."""
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models import MidiVAE

        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        z = jnp.asarray(np.random.RandomState(0).randn(3, cfg.latent_dim),
                        jnp.float32)
        out_train = model.decode(params, z)
        out_inf = model.decode(params, z, inference=True)
        for name in out_train:
            np.testing.assert_allclose(
                np.asarray(out_inf[name][0]), np.asarray(out_train[name][0]),
                rtol=2e-5, atol=2e-6, err_msg=name,
            )


class TestWideInferenceEncoders:
    """Batch-tiled wide inference encoder scans (fused_decoder/fused_lstm):
    the path serving takes at H where the untiled kernel's VMEM no longer
    fits. Tiled and untiled kernels are bit-identical on chip (row-wise
    independent math); here the tiled grid runs in interpret mode against
    the jnp scan."""

    def test_gru_wide_encoder_matches_scan(self):
        import numpy as np

        from midi_vae_tpu.ops import fused_decoder as fd

        rng = np.random.RandomState(0)
        T, B, H = 7, 16, 24
        xp = jnp.asarray(rng.randn(T, B, 3 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32)) * 0.1
        for rs in (True, False):
            got = fd._encoder_scan_wide_pallas(
                xp, h0, u, "tanh", rs, True, 8
            )
            want = fd._encoder_scan_reference(xp, h0, u, jnp.tanh, rs)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6
            )

    def test_lstm_wide_encoder_matches_scan(self):
        import numpy as np

        from midi_vae_tpu.ops import fused_lstm as fl

        rng = np.random.RandomState(1)
        T, B, H = 6, 16, 16
        xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32)) * 0.1
        for rs in (True, False):
            got = fl._encoder_scan_wide_pallas(
                xp, h0, c0, u, "tanh", rs, True, 8
            )
            want = fl._encoder_scan_reference(
                xp, h0, c0, u, jnp.tanh, rs
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6
            )

    def test_wide_btile_gates(self):
        """Pins from on-chip probes: H=1024 inference encoders tile (GRU
        f32 bt=32, bf16 128; LSTM f32 H=512 bt=128), far-past-VMEM widths
        fall to the scan, and a real tile (bt < B) is required."""
        from midi_vae_tpu.ops import fused_decoder as fd
        from midi_vae_tpu.ops import fused_lstm as fl

        assert fd._encoder_wide_btile(256, 1024, 4) == 32
        assert fd._encoder_wide_btile(256, 1024, 2) == 128
        assert fd._encoder_wide_btile(256, 4096, 4) == 0
        assert fl._encoder_wide_btile(256, 512, 4) == 128
        assert fl._encoder_wide_btile(256, 1024, 2) == 64
        assert fl._encoder_wide_btile(256, 4096, 4) == 0
        # return_sequences=False charges one pinned output block instead of
        # a double-buffered stream (and LSTM never streams cseq at
        # inference), admitting larger tiles at edge widths; both pins
        # below compile-verified on chip (bit-exact vs the jnp scan)
        assert fd._encoder_wide_btile(256, 896, 4, False) == 128
        assert fl._encoder_wide_btile(256, 1280, 2, False) == 32
