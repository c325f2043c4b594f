"""Pallas LSTM kernel tests: fused steps / whole-scan layers vs cells.py math.

Same strategy as tests/test_ops.py for the GRU family: on CPU the kernels run
in interpret mode (exercising the Mosaic lowering numerically); the compiled
TPU path is covered by bench.py and the driver's real-chip runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from midi_vae_tpu.models.cells import LSTMCell, dense_init
from midi_vae_tpu.ops import fused_lstm


@pytest.fixture
def lstm_data():
    rng = np.random.RandomState(0)
    B, D, H = 8, 16, 32
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H).astype(np.float32))
    c = jnp.asarray(rng.randn(B, H).astype(np.float32))
    params = LSTMCell.init(jax.random.PRNGKey(0), D, H)
    return x, h, c, params


class TestFusedLSTMStep:
    def test_full_step_matches_cell(self, lstm_data):
        x, h, c, p = lstm_data
        expected_h, (_, expected_c) = LSTMCell.step(
            p, LSTMCell.x_proj(p, x), (h, c), jnp.tanh
        )
        got_h, got_c = fused_lstm.lstm_step(
            x, h, c, p["w"], p["u"], p["b"], interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(expected_h),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(expected_c),
                                   rtol=2e-5, atol=2e-6)

    def test_recurrent_step_matches_cell(self, lstm_data):
        x, h, c, p = lstm_data
        xp = LSTMCell.x_proj(p, x)
        expected_h, (_, expected_c) = LSTMCell.step(p, xp, (h, c), jnp.tanh)
        got_h, got_c = fused_lstm.lstm_recurrent_step(
            xp, h, c, p["u"], interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(expected_h),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(expected_c),
                                   rtol=2e-5, atol=2e-6)

    def test_decoder_step_adapter(self, lstm_data):
        x, h, c, p = lstm_data
        step = fused_lstm.make_fused_decoder_step("tanh")
        out, (new_h, new_c) = step(p, x, (h, c))
        expected_h, _ = LSTMCell.step(p, LSTMCell.x_proj(p, x), (h, c), jnp.tanh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected_h),
                                   rtol=2e-5, atol=2e-6)
        assert out is new_h

    def test_custom_vjp_matches_autodiff(self, lstm_data):
        """The custom VJP (remat backward) must equal autodiff of the pure
        math -- this is what makes the kernel usable in the train step."""
        x, h, c, p = lstm_data

        def via_kernel(x, h, c, w, u, b):
            nh, nc = fused_lstm.lstm_step(x, h, c, w, u, b)
            return jnp.sum(nh ** 2) + jnp.sum(nc ** 2)

        def via_reference(x, h, c, w, u, b):
            nh, nc = fused_lstm._lstm_step_reference(x, h, c, w, u, b, jnp.tanh)
            return jnp.sum(nh ** 2) + jnp.sum(nc ** 2)

        g1 = jax.grad(via_kernel, argnums=(0, 1, 2, 3, 4, 5))(
            x, h, c, p["w"], p["u"], p["b"]
        )
        g2 = jax.grad(via_reference, argnums=(0, 1, 2, 3, 4, 5))(
            x, h, c, p["w"], p["u"], p["b"]
        )
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-5, atol=2e-6)

    def test_reference_scale_shapes(self):
        """Reference dims: B=256, D=61, H=256 -- must fit the VMEM budget."""
        assert fused_lstm._fits_vmem(256, 61, 256)
        assert fused_lstm._encoder_vmem_ok(256, 256)
        assert fused_lstm._decoder_vmem_ok(256, 61, 256, 2)


class TestFusedLSTMEncoderScan:
    def _data(self, T=7, B=4, H=16):
        rng = np.random.RandomState(1)
        xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32)) * 0.1
        return xp, h0, c0, u

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_matches_reference(self, return_sequences):
        xp, h0, c0, u = self._data()
        ref = fused_lstm._encoder_scan_reference(
            xp, h0, c0, u, jnp.tanh, return_sequences
        )
        got = fused_lstm.fused_lstm_encoder_scan(
            xp, h0, c0, u, "tanh", return_sequences, True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_grad_flows(self):
        xp, h0, c0, u = self._data()

        def loss(u):
            out = fused_lstm.fused_lstm_encoder_scan(xp, h0, c0, u, "tanh", False)
            return jnp.sum(out ** 2)

        def loss_ref(u):
            out = fused_lstm._encoder_scan_reference(
                xp, h0, c0, u, jnp.tanh, False
            )
            return jnp.sum(out ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss)(u)), np.asarray(jax.grad(loss_ref)(u)),
            rtol=2e-5, atol=2e-6,
        )


class TestFusedLSTMDecodeScan:
    @pytest.mark.parametrize("n_layers", [1, 2])
    def test_matches_reference(self, n_layers):
        B, D, H, T = 4, 12, 16, 6
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        dims = [D] + [H] * (n_layers - 1)
        cells = [LSTMCell.init(ks[i], dims[i], H) for i in range(n_layers)]
        out_dense = dense_init(ks[3], H, D)
        rng = np.random.RandomState(0)
        states = tuple(
            (
                jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1,
                jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1,
            )
            for _ in range(n_layers)
        )
        start = jnp.zeros((B, D), jnp.float32)
        ref = fused_lstm._decode_scan_reference(
            cells, out_dense, states, start, T,
            jnp.tanh, fused_lstm._out_act_fn("softmax"),
        )
        got = fused_lstm.fused_lstm_decode_scan(
            cells, out_dense, states, start, T, "tanh", "softmax", True
        )
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=2e-5, atol=2e-6)


class TestLSTMModelIntegration:
    def test_pallas_dispatch_matches_plain(self):
        """An LSTM model with use_pallas='on' must produce the same forward
        as use_pallas='off' (on CPU the fused ops route to identical jnp
        math -- this pins the dispatch plumbing end to end)."""
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models import MidiVAE
        from midi_vae_tpu.models.vae import loss_and_metrics
        from midi_vae_tpu.utils.synthetic import synthetic_flat

        cfg_on = small_test_config(cell_type="LSTM", use_pallas="on")
        cfg_off = small_test_config(cell_type="LSTM", use_pallas="off")
        m_on, m_off = MidiVAE(cfg_on), MidiVAE(cfg_off)
        params = m_on.init_params(jax.random.PRNGKey(0))
        flat = synthetic_flat(cfg_on, n_songs=2, windows_per_song=2)
        batch = {k: jnp.asarray(getattr(flat, k)) for k in
                 ("X", "Y", "I", "V", "D", "C", "S")}
        assert m_on._pallas_enabled() is True
        assert m_off._pallas_enabled() is False
        l_on, met_on = loss_and_metrics(m_on, params, batch, None, 0.0)
        l_off, met_off = loss_and_metrics(m_off, params, batch, None, 0.0)
        np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)

    def test_lstm_inference_decode_matches_training_decode(self):
        """The whole-scan LSTM inference path must equal the training
        decode."""
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models import MidiVAE

        cfg = small_test_config(cell_type="LSTM", use_pallas="on")
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
