"""Fused-training-backward kernel tests (ops/fused_train).

The forward AND backward of these ops are single Pallas kernels; on CPU they
run in interpret mode, checked against jax autodiff of the pure-jnp scans.
The end-to-end speed claims are covered by bench.py on the real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from midi_vae_tpu.models.cells import GRUCell, dense_init
from midi_vae_tpu.ops import fused_train as ft
from midi_vae_tpu.ops.fused_decoder import (
    _decode_scan_reference,
    _encoder_scan_reference,
    _out_act_fn,
)


@pytest.mark.slow
class TestGRULayerTrain:
    def _data(self, T=7, B=4, H=16):
        rng = np.random.RandomState(0)
        xp = jnp.asarray(rng.randn(T, B, 3 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32)) * 0.1
        return xp, h0, u

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_forward_and_gradient_parity(self, return_sequences):
        xp, h0, u = self._data()

        def via_kernel(xp, h0, u):
            out = ft.gru_layer_train(xp, h0, u, "tanh", return_sequences, True)
            return jnp.sum(jnp.sin(out))

        def via_ref(xp, h0, u):
            out = _encoder_scan_reference(xp, h0, u, jnp.tanh, return_sequences)
            return jnp.sum(jnp.sin(out))

        np.testing.assert_allclose(
            float(via_kernel(xp, h0, u)), float(via_ref(xp, h0, u)), rtol=1e-5
        )
        g1 = jax.grad(via_kernel, argnums=(0, 1, 2))(xp, h0, u)
        g2 = jax.grad(via_ref, argnums=(0, 1, 2))(xp, h0, u)
        for name, a, b in zip("xp h0 u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"d{name}",
            )

    def test_fallback_gradients_match(self):
        """Off-TPU/non-tanh the op must silently fall back to jnp autodiff
        with identical gradients (interpret=False on CPU)."""
        xp, h0, u = self._data()

        def via_op(u):
            return jnp.sum(ft.gru_layer_train(xp, h0, u, "tanh", True) ** 2)

        def via_ref(u):
            return jnp.sum(
                _encoder_scan_reference(xp, h0, u, jnp.tanh, True) ** 2
            )

        np.testing.assert_allclose(
            np.asarray(jax.grad(via_op)(u)),
            np.asarray(jax.grad(via_ref)(u)),
            rtol=2e-5, atol=1e-6,
        )

    def test_reference_scale_vmem(self):
        assert ft._train_vmem_ok(256, 256)


@pytest.mark.slow
class TestGRUDecodeTrain:
    @pytest.mark.parametrize(
        "n_layers,D,out_act",
        [(2, 12, "softmax"), (1, 12, "softmax"), (1, 1, "sigmoid"),
         (2, 12, "linear")],
    )
    def test_forward_and_gradient_parity(self, n_layers, D, out_act):
        B, H, T = 4, 16, 6
        rng = np.random.RandomState(0)
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        dims = [D] + [H] * (n_layers - 1)
        cells = [GRUCell.init(ks[i], dims[i], H) for i in range(n_layers)]
        out_dense = dense_init(ks[3], H, D)
        states = [
            jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
            for _ in range(n_layers)
        ]
        start = jnp.zeros((B, D), jnp.float32)

        def loss_kernel(cells, out_dense, states, start):
            p, l = ft.gru_decode_train(
                cells, out_dense, states, start, T, "tanh", out_act, True
            )
            return jnp.sum(jnp.sin(p)) + 0.3 * jnp.sum(jnp.cos(l))

        def loss_ref(cells, out_dense, states, start):
            p, l = _decode_scan_reference(
                cells, out_dense, states, start, T, jnp.tanh,
                _out_act_fn(out_act),
            )
            return jnp.sum(jnp.sin(p)) + 0.3 * jnp.sum(jnp.cos(l))

        args = (cells, out_dense, states, start)
        np.testing.assert_allclose(
            float(loss_kernel(*args)), float(loss_ref(*args)), rtol=1e-5
        )
        g1 = jax.tree_util.tree_leaves(
            jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
        )
        g2 = jax.tree_util.tree_leaves(
            jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        )
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6
            )

    def test_reference_scale_vmem(self):
        assert ft._dec_train_vmem_ok(256, 61, 256, 2)


@pytest.mark.slow
class TestModelLevelTrainKernels:
    @pytest.mark.parametrize(
        "enc,dec", [(True, False), (False, True), (True, True)]
    )
    def test_loss_and_grads_match_per_step(self, enc, dec):
        """A training step with the whole-layer train kernels must produce
        the same loss and gradients as the per-step path (on CPU both route
        to mathematically identical jnp scans -- this pins the dispatch)."""
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models import MidiVAE
        from midi_vae_tpu.models.vae import loss_and_metrics
        from midi_vae_tpu.utils.synthetic import synthetic_flat

        cfg_a = small_test_config(
            fused_train_encoder=enc, fused_train_decoder=dec, use_pallas="on"
        )
        cfg_b = small_test_config(
            fused_train_encoder=False, fused_train_decoder=False,
            use_pallas="on",
        )
        m_a, m_b = MidiVAE(cfg_a), MidiVAE(cfg_b)
        params = m_a.init_params(jax.random.PRNGKey(0))
        flat = synthetic_flat(cfg_a, n_songs=2, windows_per_song=2)
        batch = {
            k: jnp.asarray(getattr(flat, k))
            for k in ("X", "Y", "I", "V", "D", "C", "S")
        }

        def loss_a(p):
            return loss_and_metrics(m_a, p, batch, None, 0.0)[0]

        def loss_b(p):
            return loss_and_metrics(m_b, p, batch, None, 0.0)[0]

        np.testing.assert_allclose(
            float(loss_a(params)), float(loss_b(params)), rtol=1e-6
        )
        ga = jax.tree_util.tree_leaves(jax.grad(loss_a)(params))
        gb = jax.tree_util.tree_leaves(jax.grad(loss_b)(params))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7
            )


@pytest.mark.slow
class TestLSTMLayerTrain:
    def _data(self, T=7, B=4, H=16):
        rng = np.random.RandomState(0)
        xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32)) * 0.1
        return xp, h0, c0, u

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_forward_and_gradient_parity(self, return_sequences):
        from midi_vae_tpu.ops.fused_lstm import (
            _encoder_scan_reference as lstm_ref,
        )

        xp, h0, c0, u = self._data()

        def via_kernel(xp, h0, c0, u):
            out = ft.lstm_layer_train(
                xp, h0, c0, u, "tanh", return_sequences, True
            )
            return jnp.sum(jnp.sin(out))

        def via_ref(xp, h0, c0, u):
            out = lstm_ref(xp, h0, c0, u, jnp.tanh, return_sequences)
            return jnp.sum(jnp.sin(out))

        np.testing.assert_allclose(
            float(via_kernel(xp, h0, c0, u)), float(via_ref(xp, h0, c0, u)),
            rtol=1e-5,
        )
        g1 = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(xp, h0, c0, u)
        g2 = jax.grad(via_ref, argnums=(0, 1, 2, 3))(xp, h0, c0, u)
        for name, a, b in zip("xp h0 c0 u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"d{name}",
            )

    def test_lstm_model_train_kernels_match_per_step(self):
        """An LSTM model trains identically with and without the whole-layer
        train kernels (on CPU both reduce to the same jnp scans)."""
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models import MidiVAE
        from midi_vae_tpu.models.vae import loss_and_metrics
        from midi_vae_tpu.utils.synthetic import synthetic_flat

        cfg_a = small_test_config(
            cell_type="LSTM", use_pallas="on", fused_train_encoder=True
        )
        cfg_b = small_test_config(
            cell_type="LSTM", use_pallas="on", fused_train_encoder=False
        )
        m_a, m_b = MidiVAE(cfg_a), MidiVAE(cfg_b)
        params = m_a.init_params(jax.random.PRNGKey(0))
        flat = synthetic_flat(cfg_a, n_songs=2, windows_per_song=2)
        batch = {
            k: jnp.asarray(getattr(flat, k))
            for k in ("X", "Y", "I", "V", "D", "C", "S")
        }
        la = loss_and_metrics(m_a, params, batch, None, 0.0)[0]
        lb = loss_and_metrics(m_b, params, batch, None, 0.0)[0]
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        ga = jax.tree_util.tree_leaves(
            jax.grad(lambda p: loss_and_metrics(m_a, p, batch, None, 0.0)[0])(params)
        )
        gb = jax.tree_util.tree_leaves(
            jax.grad(lambda p: loss_and_metrics(m_b, p, batch, None, 0.0)[0])(params)
        )
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7
            )


class TestGRULayerTrainX:
    """In-kernel x-projection variant (streams raw x instead of xp)."""

    def _data(self, T=7, B=4, D=5, H=16):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(T, B, D).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        w = jnp.asarray(rng.randn(D, 3 * H).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.randn(3 * H).astype(np.float32)) * 0.05
        u = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32)) * 0.1
        return x, h0, w, b, u

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_forward_and_gradient_parity(self, return_sequences):
        x, h0, w, b, u = self._data()

        def via_kernel(x, h0, w, b, u):
            out = ft.gru_layer_train_x(
                x, h0, w, b, u, "tanh", return_sequences, True
            )
            return jnp.sum(jnp.sin(out))

        def via_ref(x, h0, w, b, u):
            out = ft._gru_layer_reference_x(
                x, h0, w, b, u, jnp.tanh, return_sequences
            )
            return jnp.sum(jnp.sin(out))

        np.testing.assert_allclose(
            float(via_kernel(x, h0, w, b, u)),
            float(via_ref(x, h0, w, b, u)), rtol=1e-5,
        )
        g1 = jax.grad(via_kernel, argnums=(0, 1, 2, 3, 4))(x, h0, w, b, u)
        g2 = jax.grad(via_ref, argnums=(0, 1, 2, 3, 4))(x, h0, w, b, u)
        for name, a, b_ in zip("x h0 w b u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-4, atol=2e-6,
                err_msg=f"d{name}",
            )

    def test_reference_scale_vmem(self):
        # notes encoder layer 1 (D=61) and layer 2 (D=256)
        assert ft._x_train_vmem_ok(256, 61, 256)
        assert ft._x_train_vmem_ok(256, 256, 256)


class TestLSTMLayerTrainX:
    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_forward_and_gradient_parity(self, return_sequences):
        rng = np.random.RandomState(0)
        T, B, D, H = 7, 4, 5, 16
        x = jnp.asarray(rng.randn(T, B, D).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        w = jnp.asarray(rng.randn(D, 4 * H).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.randn(4 * H).astype(np.float32)) * 0.05
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32)) * 0.1

        def via_kernel(x, h0, c0, w, b, u):
            out = ft.lstm_layer_train_x(
                x, h0, c0, w, b, u, "tanh", return_sequences, True
            )
            return jnp.sum(jnp.sin(out))

        def via_ref(x, h0, c0, w, b, u):
            out = ft._lstm_layer_reference_x(
                x, h0, c0, w, b, u, jnp.tanh, return_sequences
            )
            return jnp.sum(jnp.sin(out))

        args = (x, h0, c0, w, b, u)
        np.testing.assert_allclose(
            float(via_kernel(*args)), float(via_ref(*args)), rtol=1e-5
        )
        g1 = jax.grad(via_kernel, argnums=tuple(range(6)))(*args)
        g2 = jax.grad(via_ref, argnums=tuple(range(6)))(*args)
        for name, a, b_ in zip("x h0 c0 w b u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-4, atol=2e-6,
                err_msg=f"d{name}",
            )

    def test_reference_scale_vmem(self):
        assert ft._lstm_x_train_vmem_ok(256, 61, 256)
        assert ft._lstm_x_train_vmem_ok(256, 256, 256)


@pytest.mark.slow
class TestGRUStack2TrainX:
    """2-layer encoder-stack kernel (kept as an op; the model uses the
    per-layer dispatch -- measured equal end-to-end)."""

    @pytest.mark.parametrize("return_sequences", [False, True])
    def test_forward_and_gradient_parity(self, return_sequences):
        rng = np.random.RandomState(0)
        T, B, D, H = 7, 4, 5, 16
        x = jnp.asarray(rng.randn(T, B, D).astype(np.float32)) * 0.3
        h01 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        h02 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1

        def mk(d):
            return {
                "w": jnp.asarray(rng.randn(d, 3 * H).astype(np.float32)) * 0.2,
                "b": jnp.asarray(rng.randn(3 * H).astype(np.float32)) * 0.05,
                "u": jnp.asarray(rng.randn(H, 3 * H).astype(np.float32)) * 0.1,
            }

        p1, p2 = mk(D), mk(H)

        def via_kernel(x, h01, h02, p1, p2):
            return jnp.sum(jnp.sin(ft.gru_stack2_train_x(
                x, h01, h02, p1, p2, "tanh", return_sequences, True
            )))

        def via_ref(x, h01, h02, p1, p2):
            return jnp.sum(jnp.sin(ft._stack2_reference(
                x, h01, h02, p1, p2, jnp.tanh, return_sequences
            )))

        args = (x, h01, h02, p1, p2)
        np.testing.assert_allclose(
            float(via_kernel(*args)), float(via_ref(*args)), rtol=1e-5
        )
        g1 = jax.tree_util.tree_leaves(
            jax.grad(via_kernel, argnums=tuple(range(5)))(*args)
        )
        g2 = jax.tree_util.tree_leaves(
            jax.grad(via_ref, argnums=tuple(range(5)))(*args)
        )
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6
            )


@pytest.mark.slow
class TestBf16TrainKernels:
    """bf16 variants of the fused-train kernels (interpret mode).

    On the real chip the weight/bias grads leave the kernels in f32 (Mosaic
    cannot mask bf16 stores along subelements) and are cast back to the
    primal dtype by the VJP wrappers; these tests pin that contract -- grads
    come back in the primal dtype and match the jnp scan within bf16
    tolerance. The Mosaic-lowering side (incl. the degenerate-K D=1
    projection) is exercised by bench/tools on the TPU itself.
    """

    def test_decode_train_bf16_grad_dtypes_and_parity(self):
        B, D, H, T = 4, 12, 16, 6
        rng = np.random.RandomState(0)
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        bf16 = jnp.bfloat16
        cells = [
            jax.tree_util.tree_map(
                lambda a: a.astype(bf16), GRUCell.init(ks[i], d, H)
            )
            for i, d in enumerate([D, H])
        ]
        out_dense = jax.tree_util.tree_map(
            lambda a: a.astype(bf16), dense_init(ks[3], H, D)
        )
        states = [jnp.asarray(rng.randn(B, H), bf16) * 0.1 for _ in range(2)]
        start = jnp.zeros((B, D), bf16)

        def loss_kernel(cells, out_dense, states, start):
            p, l = ft.gru_decode_train(
                cells, out_dense, states, start, T, "tanh", "softmax", True
            )
            return jnp.sum(jnp.sin(p.astype(jnp.float32)))

        def loss_ref(cells, out_dense, states, start):
            p, l = _decode_scan_reference(
                cells, out_dense, states, start, T, jnp.tanh,
                _out_act_fn("softmax"),
            )
            return jnp.sum(jnp.sin(p.astype(jnp.float32)))

        args = (cells, out_dense, states, start)
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        # cotangents must match the primal dtypes (custom_vjp contract)
        for g, p in zip(
            jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(args)
        ):
            assert g.dtype == p.dtype, (g.dtype, p.dtype)
        for a, b in zip(
            jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0.15, atol=0.02,
            )

    @pytest.mark.parametrize("D", [1, 12])
    def test_layer_train_x_bf16_grad_dtypes(self, D):
        # D=1 is the velocity-encoder case: degenerate-K projection runs in
        # f32 inside the kernel (wrapper casts w/b) -- grads still bf16 out
        T, B, H = 6, 4, 16
        rng = np.random.RandomState(1)
        bf16 = jnp.bfloat16
        x = jnp.asarray(rng.randn(T, B, D), bf16) * 0.3
        h0 = jnp.asarray(rng.randn(B, H), bf16) * 0.1
        w = jnp.asarray(rng.randn(D, 3 * H), bf16) * 0.1
        b = jnp.zeros((3 * H,), bf16)
        u = jnp.asarray(rng.randn(H, 3 * H), bf16) * 0.1

        def via_kernel(*a):
            return jnp.sum(
                jnp.sin(ft.gru_layer_train_x(*a, "tanh", True, True)
                        .astype(jnp.float32))
            )

        def via_ref(x, h0, w, b, u):
            return jnp.sum(
                jnp.sin(
                    ft._gru_layer_reference_x(x, h0, w, b, u, jnp.tanh, True)
                    .astype(jnp.float32)
                )
            )

        args = (x, h0, w, b, u)
        gk = jax.grad(via_kernel, argnums=tuple(range(5)))(*args)
        gr = jax.grad(via_ref, argnums=tuple(range(5)))(*args)
        for g, p in zip(gk, args):
            assert g.dtype == p.dtype, (g.dtype, p.dtype)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=0.15, atol=0.02,
            )


@pytest.mark.slow
class TestMultiheadDecodeTrain:
    """Fused multi-head decode: 2-layer primary + K 1-layer heads in one
    kernel pair (interpret mode vs the per-head reference scans)."""

    def _specs(self, B=4, H=16, Dp=12):
        ks = jax.random.split(jax.random.PRNGKey(0), 12)
        rng = np.random.RandomState(0)
        primary = {
            "cells": [GRUCell.init(ks[0], Dp, H), GRUCell.init(ks[1], H, H)],
            "out": dense_init(ks[2], H, Dp),
            "init": [
                jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
                for _ in range(2)
            ],
            "start": jnp.zeros((B, Dp), jnp.float32),
        }

        def mk_head(key, D):
            return {
                "cells": [GRUCell.init(key, D, H)],
                "out": dense_init(jax.random.fold_in(key, 1), H, D),
                "init": [jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1],
                "start": jnp.zeros((B, D), jnp.float32),
            }

        heads = (mk_head(ks[3], 1), mk_head(ks[4], 2))
        return primary, heads, ("softmax", "sigmoid", "softmax")

    @pytest.mark.parametrize("n_heads", [1, 2])
    def test_forward_and_gradient_parity(self, n_heads):
        T = 6
        primary, heads, out_acts = self._specs()
        heads = heads[:n_heads]
        out_acts = out_acts[: 1 + n_heads]

        def loss_mh(primary, heads):
            outs = ft.gru_decode_multihead_train(
                primary, heads, T, "tanh", out_acts, True
            )
            return sum(
                jnp.sum(jnp.sin(p)) + 0.3 * jnp.sum(jnp.cos(l))
                for p, l in outs
            )

        def loss_ref(primary, heads):
            outs = ft._mh_reference(primary, heads, T, "tanh", out_acts)
            return sum(
                jnp.sum(jnp.sin(p)) + 0.3 * jnp.sum(jnp.cos(l))
                for p, l in outs
            )

        np.testing.assert_allclose(
            float(loss_mh(primary, heads)), float(loss_ref(primary, heads)),
            rtol=1e-5,
        )
        g1 = jax.grad(loss_mh, argnums=(0, 1))(primary, heads)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(primary, heads)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6
            )

    def test_reference_scale_vmem(self):
        # notes (D=61) + velocity (D=1) + held (D=2) at B=256, H=256
        assert ft._mh_vmem_ok(256, 61, [1, 2], 256)

    def test_bf16_residual_dtype(self):
        """residual_dtype=bf16 narrows ONLY the h-seq residual streams:
        the forward (probs/logits come off the f32 VMEM carry) must be
        bit-equal to the default, and the gradients -- whose gate
        recomputation reads the rounded h values -- close to f32."""
        T = 6
        primary, heads, out_acts = self._specs()
        heads = heads[:1]
        out_acts = out_acts[:2]

        def loss(rdt):
            def f(primary, heads):
                outs = ft.gru_decode_multihead_train(
                    primary, heads, T, "tanh", out_acts, True, rdt
                )
                return sum(
                    jnp.sum(jnp.sin(p)) + 0.3 * jnp.sum(jnp.cos(l))
                    for p, l in outs
                )
            return f

        def fwd(primary, heads, rdt):
            return ft.gru_decode_multihead_train(
                primary, heads, T, "tanh", out_acts, True, rdt
            )

        out_f32 = fwd(primary, heads, None)
        g_f32 = jax.grad(loss(None), argnums=(0, 1))(primary, heads)
        out_bf = fwd(primary, heads, jnp.bfloat16)
        g_bf = jax.grad(loss(jnp.bfloat16), argnums=(0, 1))(primary, heads)

        for a, b in zip(
            jax.tree_util.tree_leaves(out_f32),
            jax.tree_util.tree_leaves(out_bf),
        ):
            assert a.dtype == b.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_f32),
            jax.tree_util.tree_leaves(g_bf),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-3
            )


@pytest.mark.slow
class TestMultibranchEncodeTrain:
    """Fused multi-branch encode: 2-layer notes stack + K independent
    1-layer branches (incl. one SHORTER than the stack) in one kernel pair
    (interpret mode vs the per-branch reference scans)."""

    def _specs(self, B=4, H=16, D=12, T=6):
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        rng = np.random.RandomState(1)

        def gru_p(key, d):
            c = GRUCell.init(key, d, H)
            return {"w": c["w"], "b": c["b"], "u": c["u"]}

        stack = {
            "x": jnp.asarray(rng.randn(T, B, D), jnp.float32) * 0.3,
            "p1": gru_p(ks[0], D),
            "p2": gru_p(ks[1], H),
        }
        branches = (
            {"x": jnp.asarray(rng.randn(T, B, 1), jnp.float32) * 0.3,
             "p": gru_p(ks[2], 1)},
            {"x": jnp.asarray(rng.randn(2, B, 5), jnp.float32) * 0.3,
             "p": gru_p(ks[3], 5)},  # Tk=2 < T: the instrument pattern
        )
        return stack, branches

    @pytest.mark.parametrize("n_branches", [0, 1, 2])
    def test_forward_and_gradient_parity(self, n_branches):
        stack, branches = self._specs()
        branches = branches[:n_branches]

        def loss_mb(stack, branches):
            h2, finals = ft.gru_encode_multibranch_train(
                stack, branches, "tanh", True
            )
            return jnp.sum(jnp.sin(h2)) + sum(
                jnp.sum(jnp.cos(h)) for h in finals
            )

        def loss_ref(stack, branches):
            h2, finals = ft._encmb_reference(stack, branches, jnp.tanh)
            return jnp.sum(jnp.sin(h2)) + sum(
                jnp.sum(jnp.cos(h)) for h in finals
            )

        np.testing.assert_allclose(
            float(loss_mb(stack, branches)),
            float(loss_ref(stack, branches)), rtol=1e-5,
        )
        g1 = jax.grad(loss_mb, argnums=(0, 1))(stack, branches)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(stack, branches)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6
            )

    def test_reference_scale_vmem(self):
        # notes (D=61, T=64) + velocity (D=1) + instrument (D=16, T=4)
        assert ft._encmb_vmem_ok(256, 61, [1, 16], 256)


class TestMultiheadModelDispatch:
    """CPU coverage of the MODEL-level multihead dispatch glue (head
    collection, out_acts ordering, swapaxes) via the interpret hook --
    the kernel itself runs in Pallas interpret mode."""

    def test_decode_glue_matches_reference_paths(self):
        from midi_vae_tpu.config import small_test_config
        from midi_vae_tpu.models.vae import MidiVAE

        cfg = small_test_config(batch_size=4, meta_held_notes=True)
        assert cfg.meta_velocity and cfg.meta_held_notes

        m_ref = MidiVAE(cfg)  # plain CPU scans
        m_mh = MidiVAE(cfg, platform="tpu")  # enables the dispatch path
        m_mh._interpret = True  # kernel in interpret mode on CPU

        params = m_ref.init_params(jax.random.PRNGKey(0))
        z = jnp.asarray(
            np.random.RandomState(0).randn(4, cfg.latent_dim), jnp.float32
        ) * 0.3
        out_ref = m_ref.decode(params, z, inference=False)
        calls = []
        orig = ft.gru_decode_multihead_train

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        ft.gru_decode_multihead_train = spy
        try:
            out_mh = m_mh.decode(params, z, inference=False)
        finally:
            ft.gru_decode_multihead_train = orig
        assert calls, "multihead kernel did not dispatch"
        assert set(out_ref) == set(out_mh)
        for name in ("notes", "velocity", "held"):
            for a, b in zip(out_mh[name], out_ref[name]):
                assert a.shape == b.shape, name
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                    err_msg=name,
                )


@pytest.mark.slow
class TestBf16NarrowHeadGates:
    """bf16 + degenerate-K (D<8) projections hit Mosaic's mixed-type
    broadcast ('vector.broadcast' verification error at reference scale) --
    the dispatch gates must route those to the fallback paths. Regression
    for the study-breaking bf16 crash after the narrow heads were fused."""

    def _decode_specs(self, dtype):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        cells = [GRUCell.init(ks[0], 1, 16), GRUCell.init(ks[1], 16, 16)]
        cells = jax.tree_util.tree_map(lambda a: a.astype(dtype), cells)
        start = jnp.zeros((4, 1), dtype)
        states = [jnp.zeros((4, 16), dtype)] * 2
        return cells, start, states

    def test_narrow_decode_head_rejects_bf16(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cells, start, states = self._decode_specs(jnp.bfloat16)
        assert ft._dec_mode(cells, start, states, "tanh", "sigmoid",
                            False) == "scan"
        cells, start, states = self._decode_specs(jnp.float32)
        assert ft._dec_mode(cells, start, states, "tanh", "sigmoid",
                            False) == "inplace"

    def test_multihead_and_multibranch_reject_bf16(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        for dtype, expect in ((jnp.bfloat16, False), (jnp.float32, True)):
            primary = {
                "start": jnp.zeros((4, 12), dtype),
                "init": [jnp.zeros((4, 16), dtype)] * 2,
            }
            heads = ({"start": jnp.zeros((4, 1), dtype)},)
            got = ft._mh_use_pallas(primary, heads, "tanh",
                                    ("softmax", "sigmoid"), False)
            assert got is expect, dtype

            stack = {
                "x": jnp.zeros((6, 4, 12), dtype),
                "p1": {"u": jnp.zeros((16, 48), dtype)},
            }
            branches = ({"x": jnp.zeros((6, 4, 1), dtype)},)
            got = ft._encmb_use_pallas(stack, branches, "tanh", False)
            assert got is expect, dtype

    def test_narrow_bf16_head_promotes_to_f32_fused(self):
        """gru_decode_train promotes narrow bf16 heads whole to f32 and runs
        the fused kernels; outputs and grads come back in bf16."""
        T = 6
        cells, start, states = self._decode_specs(jnp.bfloat16)
        ks = jax.random.split(jax.random.PRNGKey(2), 1)
        out_dense = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), dense_init(ks[0], 16, 1)
        )

        def loss(cells, out_dense, states, start):
            probs, logits = ft.gru_decode_train(
                cells, out_dense, states, start, T, "tanh", "sigmoid", True
            )
            assert probs.dtype == jnp.bfloat16
            return jnp.sum(jnp.sin(probs.astype(jnp.float32)))

        def loss_ref(cells, out_dense, states, start):
            probs, _ = ft._decode_scan_reference(
                cells, out_dense, list(states), start, T, jnp.tanh,
                jax.nn.sigmoid,
            )
            return jnp.sum(jnp.sin(probs.astype(jnp.float32)))

        v = float(loss(cells, out_dense, states, start))
        v_ref = float(loss_ref(cells, out_dense, states, start))
        np.testing.assert_allclose(v, v_ref, rtol=2e-2)
        g = jax.grad(loss, argnums=(0, 1))(cells, out_dense, states, start)
        for leaf in jax.tree_util.tree_leaves(g):
            assert leaf.dtype == jnp.bfloat16
            assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))


class TestDtypeAwareVmemBudgets:
    """The VMEM admission gates charge operand-resident buffers at the
    operands' itemsize and f32 accumulators/temporaries at 4 bytes, so bf16
    keeps the fused kernels at twice the layer width (H=512 at B=256) while
    every f32 decision is unchanged (itemsize defaults to 4)."""

    B = 256

    def test_xp_streaming_train_budget(self):
        assert ft._train_vmem_ok(self.B, 256)
        assert ft._train_vmem_ok(self.B, 256, 2)
        # H=512 f32 REJECTED: its bwd kernel's scoped-vmem fit is
        # compile-context-dependent (OOMs at 17.6MB under the AOT path
        # even though the runtime JIT fits it) -- only bf16, with ~2x the
        # margin, is admitted at H=512
        assert not ft._train_vmem_ok(self.B, 512)
        assert ft._train_vmem_ok(self.B, 512, 2)        # bf16 admitted
        assert not ft._train_vmem_ok(self.B, 1024, 2)

    def test_encoder_scan_budget(self):
        """H=512 f32 is admitted by the on-chip-calibrated ceiling
        (compile + parity verified on the v5e); H=640 f32 is not."""
        from midi_vae_tpu.ops import fused_decoder as fd

        assert fd._encoder_vmem_ok(self.B, 256)
        assert fd._encoder_vmem_ok(self.B, 512)
        assert not fd._encoder_vmem_ok(self.B, 640)
        assert fd._encoder_vmem_ok(self.B, 512, 2)

    def test_inference_decode_budget(self):
        from midi_vae_tpu.ops import fused_decoder as fd

        assert fd._decoder_vmem_ok(self.B, 61, 256, 2)
        assert fd._decoder_vmem_ok(self.B, 61, 512, 2)
        assert not fd._decoder_vmem_ok(self.B, 61, 640, 2)
        assert fd._decoder_vmem_ok(self.B, 61, 512, 2, 2)

    def test_per_step_budget(self):
        from midi_vae_tpu.ops import fused_gru as fg

        assert fg._fits_vmem(self.B, 512, 512)          # f32 fits per-step
        assert not fg._fits_vmem(self.B, 1024, 1024)
        assert not fg._fits_vmem(self.B, 1024, 1024, 2)

    def test_lstm_budgets_stay_off_at_512(self):
        """The 4H LSTM gate block keeps the whole-layer kernels out of
        budget at H=512 even under bf16 -- pin so a silent admission is a
        deliberate decision, not an accident."""
        from midi_vae_tpu.ops import fused_lstm as fl

        assert ft._lstm_train_vmem_ok(self.B, 256, 2)
        assert not ft._lstm_train_vmem_ok(self.B, 512, 2)
        assert not fl._encoder_vmem_ok(self.B, 512, 2)
        assert not fl._decoder_vmem_ok(self.B, 61, 512, 2, 2)

    def test_x_projection_variant_stays_off_at_512(self):
        assert ft._x_train_vmem_ok(self.B, 256, 256, 2)
        assert not ft._x_train_vmem_ok(self.B, 512, 512, 2)
        assert not ft._x_train_vmem_ok(self.B, 61, 512, 2)


@pytest.mark.slow
class TestWideTwoPassTrain:
    """Wide-model two-pass training backward (fused_train 'wide' mode):
    a batch-tiled Pallas kernel emits only the per-step gate grads da_cat
    (+ carry grads); the weight grads become flat XLA matmuls outside.
    This is the path H=512 f32 / H=1024 take, where the in-place kernels'
    dU residency no longer fits VMEM. Exercised here in interpret mode with
    the mode forced and the budget shrunk so the batch tiling (nB > 1 grid)
    is real."""

    def _gru_data(self, T=7, B=16, H=24, dtype=np.float32):
        rng = np.random.RandomState(3)
        xp = jnp.asarray(rng.randn(T, B, 3 * H).astype(dtype)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(dtype)) * 0.1
        u = jnp.asarray(rng.randn(H, 3 * H).astype(dtype)) * 0.1
        return xp, h0, u

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_gru_wide_gradient_parity(self, return_sequences, monkeypatch):
        xp, h0, u = self._gru_data()
        # force real tiling: bwd tile < B
        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 40_000)
        fwd_bt, bwd_bt = ft._gru_wide_btiles(16, 24, 4)
        assert bwd_bt and bwd_bt < 16

        def via_wide(xp, h0, u):
            monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", "wide")
            try:
                out = ft.gru_layer_train(
                    xp, h0, u, "tanh", return_sequences, True
                )
            finally:
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
            return jnp.sum(jnp.sin(out))

        def via_ref(xp, h0, u):
            out = _encoder_scan_reference(xp, h0, u, jnp.tanh, return_sequences)
            return jnp.sum(jnp.sin(out))

        np.testing.assert_allclose(
            float(via_wide(xp, h0, u)), float(via_ref(xp, h0, u)), rtol=1e-5
        )
        g1 = jax.grad(via_wide, argnums=(0, 1, 2))(xp, h0, u)
        g2 = jax.grad(via_ref, argnums=(0, 1, 2))(xp, h0, u)
        for name, a, b in zip("xp h0 u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"d{name}",
            )

    @pytest.mark.parametrize("return_sequences", [True, False])
    def test_lstm_wide_gradient_parity(self, return_sequences, monkeypatch):
        from midi_vae_tpu.ops.fused_lstm import (
            _encoder_scan_reference as lstm_ref,
        )

        rng = np.random.RandomState(4)
        T, B, H = 6, 16, 16
        xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32)) * 0.1

        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 27_000)
        fwd_bt, bwd_bt = ft._lstm_wide_btiles(B, H, 4)
        assert bwd_bt and bwd_bt < B

        def via_wide(xp, h0, c0, u):
            monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", "wide")
            try:
                out = ft.lstm_layer_train(
                    xp, h0, c0, u, "tanh", return_sequences, True
                )
            finally:
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
            return jnp.sum(jnp.sin(out))

        def via_ref(xp, h0, c0, u):
            out = lstm_ref(xp, h0, c0, u, jnp.tanh, return_sequences)
            return jnp.sum(jnp.sin(out))

        np.testing.assert_allclose(
            float(via_wide(xp, h0, c0, u)),
            float(via_ref(xp, h0, c0, u)),
            rtol=1e-5,
        )
        g1 = jax.grad(via_wide, argnums=(0, 1, 2, 3))(xp, h0, c0, u)
        g2 = jax.grad(via_ref, argnums=(0, 1, 2, 3))(xp, h0, c0, u)
        for name, a, b in zip("xp h0 c0 u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"d{name}",
            )

    def test_wide_admission_regimes(self):
        """The regimes measured on the v5e AOT compiler: every (H, dtype)
        the in-place kernels reject must be caught by the wide tiles the
        probes verified to compile (or fall through to the scan)."""
        B = 256
        # reference scale: in-place stays the dispatch
        assert ft._train_vmem_ok(B, 256)
        # H=512 f32: in-place rejected (AOT), wide admitted -- fwd untiled,
        # bwd tiled at 128 (both compile-verified on chip)
        assert not ft._train_vmem_ok(B, 512)
        assert ft._gru_wide_btiles(B, 512, 4) == (256, 128)
        # H=1024 f32: wide admitted at (32, 16) -- the bt=32 bwd OOMed on
        # the AOT compiler, bt=16 compiled
        assert ft._gru_wide_btiles(B, 1024, 4) == (32, 16)
        # H=1024 bf16: bwd bt=64 OOMed (the f32 casts of the streamed
        # blocks triple bf16's temp footprint), bt=32 compiled
        fwd_bt, bwd_bt = ft._gru_wide_btiles(B, 1024, 2)
        assert bwd_bt == 32 and fwd_bt >= 64
        # far past VMEM (U alone > 16 MB): no tile fits, scan it is
        assert ft._gru_wide_btiles(B, 4096, 4) == (0, 0)
        # LSTM: H=512 f32 wide admitted
        assert ft._lstm_wide_btiles(B, 512, 4)[1] >= 64
        assert ft._lstm_wide_btiles(B, 4096, 4) == (0, 0)

    def test_gru_bf16_wide_matches_inplace(self, monkeypatch):
        """bf16 wide weight grads come from bf16-rounded pass-1 streams
        (standard mixed precision) where the in-place kernels accumulate
        from unrounded f32 da; after the final cast to u.dtype the two
        must agree to a couple of bf16 ulps."""
        xp, h0, u = self._gru_data(T=12, B=16, H=24)
        xp, h0, u = (a.astype(jnp.bfloat16) for a in (xp, h0, u))
        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 40_000)
        assert ft._gru_wide_btiles(16, 24, 2)[1] < 16  # real tiling

        def grads(mode):
            def f(u):
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", mode)
                try:
                    out = ft.gru_layer_train(xp, h0, u, "tanh", True, True)
                finally:
                    monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
                return jnp.sum(jnp.sin(out.astype(jnp.float32)))
            return np.asarray(jax.grad(f)(u), dtype=np.float32)

        gw, gi = grads("wide"), grads("inplace")
        np.testing.assert_allclose(gw, gi, rtol=0.016, atol=1e-6)

    def test_lstm_bf16_wide_matches_inplace(self, monkeypatch):
        from midi_vae_tpu.ops.fused_lstm import _lstm_gates  # noqa: F401

        rng = np.random.RandomState(7)
        T, B, H = 10, 16, 16
        bf = jnp.bfloat16
        xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.3, bf)
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1, bf)
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1, bf)
        u = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.1, bf)
        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 27_000)
        assert ft._lstm_wide_btiles(B, H, 2)[1] < B

        def grads(mode):
            def f(u):
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", mode)
                try:
                    out = ft.lstm_layer_train(
                        xp, h0, c0, u, "tanh", True, True
                    )
                finally:
                    monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
                return jnp.sum(jnp.sin(out.astype(jnp.float32)))
            return np.asarray(jax.grad(f)(u), dtype=np.float32)

        np.testing.assert_allclose(
            grads("wide"), grads("inplace"), rtol=0.016, atol=1e-6
        )

    def test_mode_is_scan_off_tpu(self):
        """On CPU (no interpret, no force) the wide path must never
        dispatch a real Pallas kernel."""
        xp, h0, u = self._gru_data(H=512 // 8)
        assert ft._gru_mode(xp, h0, "tanh", False) == "scan"
        assert ft._gru_mode(xp, h0, "relu", True) == "scan"  # non-tanh

    def test_btile_picker(self):
        assert ft._btile(256, lambda bt: bt <= 64) == 64
        assert ft._btile(256, lambda bt: True) == 256
        assert ft._btile(256, lambda bt: False) == 0
        assert ft._btile(4, lambda bt: True) == 0     # < 8 rows never tiles
        assert ft._btile(96, lambda bt: bt <= 30) == 24  # non-power-of-two B


@pytest.mark.slow
class TestWideDecodeTrain:
    """Wide two-pass decode-head backward: pass-1 kernel emits dlogits +
    per-layer gate grads on a batch-tiled grid; weight grads reduce as flat
    XLA matmuls. The path every decode head takes at H=512 (all dtypes --
    the in-place _dec_train_vmem_ok model is dtype-blind and rejects 512)."""

    def _head(self, D, n, B=16, H=16, seed=5):
        rng = np.random.RandomState(seed)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.2
        cells = [
            {"w": mk(D if layer == 0 else H, 3 * H), "u": mk(H, 3 * H),
             "b": mk(3 * H)}
            for layer in range(n)
        ]
        out = {"w": mk(H, D), "b": mk(D)}
        states = [mk(B, H) for _ in range(n)]
        start = mk(B, D)
        return cells, out, states, start

    @pytest.mark.parametrize(
        "D,n,out_act",
        [(12, 2, "softmax"), (12, 1, "softmax"), (1, 1, "sigmoid"),
         (12, 2, "linear")],
    )
    def test_wide_decode_gradient_parity(self, D, n, out_act, monkeypatch):
        T, B, H = 6, 16, 16
        cells, out, states, start = self._head(D, n, B, H)
        # budget at which the bwd tiles (asserted) for both layer counts
        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 200_000)
        bts = ft._dec_wide_btiles(B, D, H, n, 4)
        assert bts[1] and bts[1] < B

        def via_wide(args):
            cells, out, states, start = args
            monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", "wide")
            try:
                probs, logits = ft.gru_decode_train(
                    cells, out, states, start, T, "tanh", out_act, True
                )
            finally:
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
            return jnp.sum(jnp.sin(probs)) + 0.3 * jnp.sum(jnp.cos(logits))

        def via_ref(args):
            cells, out, states, start = args
            probs, logits = _decode_scan_reference(
                cells, out, states, start, T, jnp.tanh, _out_act_fn(out_act)
            )
            return jnp.sum(jnp.sin(probs)) + 0.3 * jnp.sum(jnp.cos(logits))

        args = (cells, out, states, start)
        v0, g0 = jax.value_and_grad(via_ref)(args)
        v1, g1 = jax.value_and_grad(via_wide)(args)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
        flat0, _ = jax.tree_util.tree_flatten(g0)
        flat1, _ = jax.tree_util.tree_flatten(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6
            )

    def test_wide_decode_bf16_matches_inplace(self, monkeypatch):
        """Decode-head twin of test_gru_bf16_wide_matches_inplace: bf16
        pass-1 dlogits/gate-grad streams vs the in-place f32 accumulation
        must agree to bf16 rounding after the final cast."""
        T, B, H, D, n = 6, 16, 16, 12, 2
        cells, out, states, start = self._head(D, n, B, H)
        bf = jnp.bfloat16
        cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(bf), t)
        cells, out, states, start = (
            cast(cells), cast(out), cast(states), cast(start)
        )
        monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 200_000)
        assert ft._dec_wide_btiles(B, D, H, n, 2)[1] < B

        def grads(mode):
            def f(args):
                cells, out = args
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", mode)
                try:
                    probs, logits = ft.gru_decode_train(
                        cells, out, states, start, T, "tanh", "softmax",
                        True,
                    )
                finally:
                    monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
                return jnp.sum(jnp.sin(probs.astype(jnp.float32)))
            g = jax.grad(f)((cells, out))
            return [np.asarray(a, dtype=np.float32)
                    for a in jax.tree_util.tree_leaves(g)]

        for a, b in zip(grads("wide"), grads("inplace")):
            np.testing.assert_allclose(a, b, rtol=0.016, atol=1e-5)

    def test_wide_decode_admission_regimes(self):
        """Pins from the on-chip compile probes (v5e, AOT): every decode
        head geometry at H=512 f32 is wide-admitted at a verified tile;
        H=1024 falls through to the scan (2 U's + W2 alone exceed VMEM)."""
        B = 256
        assert not ft._dec_train_vmem_ok(B, 61, 512, 2)
        assert ft._dec_wide_btiles(B, 61, 512, 2, 4) == (128, 32)
        assert ft._dec_wide_btiles(B, 1, 512, 1, 4) == (256, 128)
        assert ft._dec_wide_btiles(B, 2, 512, 1, 4) == (256, 128)
        assert ft._dec_wide_btiles(B, 61, 1024, 2, 4) == (0, 0)
        # reference scale keeps the in-place kernels
        assert ft._dec_train_vmem_ok(B, 61, 256, 2)


class TestKernelShapeFuzz:
    """Randomized shapes through the fused training kernels (interpret
    mode, both dispatch tiers), values + gradients vs the jnp scan
    references. Fixed-shape tests above pin the production geometries;
    this battery sweeps odd T/B/H (non-power-of-two batches, H below a
    lane, single-step sequences) that tile pickers and index maps must
    also survive."""

    @pytest.mark.parametrize("case", range(10))
    def test_layer_kernels(self, case, monkeypatch):
        rng = np.random.RandomState(100 + case)
        T = int(rng.choice([1, 2, 5, 9, 13]))
        B = int(rng.choice([8, 12, 16, 24, 40]))
        H = int(rng.choice([8, 16, 24, 48]))
        cell = rng.choice(["gru", "lstm"])
        rs = bool(rng.randint(2))
        mode = rng.choice(["inplace", "wide"])
        if mode == "wide":
            monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 40_000)
        g = 4 if cell == "lstm" else 3
        xp = jnp.asarray(rng.randn(T, B, g * H).astype(np.float32)) * 0.3
        h0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        c0 = jnp.asarray(rng.randn(B, H).astype(np.float32)) * 0.1
        u = jnp.asarray(rng.randn(H, g * H).astype(np.float32)) * 0.1

        def via_kernel(xp, h0, c0, u):
            monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", mode)
            try:
                if cell == "gru":
                    out = ft.gru_layer_train(xp, h0, u, "tanh", rs, True)
                else:
                    out = ft.lstm_layer_train(xp, h0, c0, u, "tanh", rs, True)
            finally:
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
            return jnp.sum(jnp.sin(out))

        def via_ref(xp, h0, c0, u):
            if cell == "gru":
                out = _encoder_scan_reference(xp, h0, u, jnp.tanh, rs)
            else:
                from midi_vae_tpu.ops.fused_lstm import (
                    _encoder_scan_reference as lstm_ref,
                )
                out = lstm_ref(xp, h0, c0, u, jnp.tanh, rs)
            return jnp.sum(jnp.sin(out))

        label = f"{cell} T={T} B={B} H={H} rs={rs} mode={mode}"
        v1, g1 = jax.value_and_grad(via_kernel, argnums=(0, 1, 2, 3))(
            xp, h0, c0, u
        )
        v2, g2 = jax.value_and_grad(via_ref, argnums=(0, 1, 2, 3))(
            xp, h0, c0, u
        )
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5,
                                   err_msg=label)
        for name, a, b in zip("xp h0 c0 u".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6,
                err_msg=f"{label} d{name}",
            )

    @pytest.mark.parametrize("case", range(6))
    def test_decode_kernels(self, case, monkeypatch):
        rng = np.random.RandomState(200 + case)
        T = int(rng.choice([1, 3, 6, 10]))
        B = int(rng.choice([8, 12, 16, 24]))
        H = int(rng.choice([8, 16, 32]))
        n = int(rng.choice([1, 2]))
        D = int(rng.choice([1, 2, 5, 12, 61]))
        out_act = "sigmoid" if D == 1 and rng.randint(2) else \
            rng.choice(["softmax", "linear"])
        mode = rng.choice(["inplace", "wide"])
        if mode == "wide":
            monkeypatch.setattr(ft, "_WIDE_BUDGET_BYTES", 200_000)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.2
        cells = [
            {"w": mk(D if layer == 0 else H, 3 * H), "u": mk(H, 3 * H),
             "b": mk(3 * H)}
            for layer in range(n)
        ]
        out = {"w": mk(H, D), "b": mk(D)}
        states = [mk(B, H) for _ in range(n)]
        start = mk(B, D)

        def via_kernel(args):
            cells, out, states, start = args
            monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", mode)
            try:
                probs, logits = ft.gru_decode_train(
                    cells, out, states, start, T, "tanh", out_act, True
                )
            finally:
                monkeypatch.setattr(ft, "_FORCE_TRAIN_MODE", None)
            return jnp.sum(jnp.sin(probs)) + 0.3 * jnp.sum(jnp.cos(logits))

        def via_ref(args):
            cells, out, states, start = args
            probs, logits = _decode_scan_reference(
                cells, out, states, start, T, jnp.tanh, _out_act_fn(out_act)
            )
            return jnp.sum(jnp.sin(probs)) + 0.3 * jnp.sum(jnp.cos(logits))

        label = f"T={T} B={B} H={H} n={n} D={D} {out_act} mode={mode}"
        args = (cells, out, states, start)
        v0, g0 = jax.value_and_grad(via_ref)(args)
        v1, g1 = jax.value_and_grad(via_kernel)(args)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5,
                                   err_msg=label)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6,
                err_msg=label,
            )
