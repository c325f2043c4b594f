"""Keras-2.0.8-exact optimizer semantics (training.keras_optim).

The reference trains with Keras 2.0.8 Adam/RMSprop (vae_definition.py:174-175,
pitch_classifier.py:100-101). Gradient parity is proven by the differential
checker; these tests pin the optimizer UPDATE RULE against an independent
numpy transcription of the Keras formulas, and check the documented
divergence from optax's stock implementations where the semantics differ
(epsilon placement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from midi_vae_tpu.config import small_test_config
from midi_vae_tpu.training.keras_optim import keras_adam, keras_rmsprop
from midi_vae_tpu.training.trainer import make_optimizer


def _tree(seed):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32)),
    }


def _grads(seed, step, scale=1.0):
    rng = np.random.default_rng(seed * 1000 + step)
    return {
        "w": jnp.asarray(scale * rng.normal(size=(4, 3)).astype(np.float32)),
        "b": jnp.asarray(scale * rng.normal(size=(3,)).astype(np.float32)),
    }


class TestKerasAdam:
    def test_matches_numpy_transcription(self):
        lr, b1, b2, eps = 2e-3, 0.9, 0.999, 1e-8
        opt = keras_adam(lr, b1, b2, eps)
        params = _tree(0)
        state = opt.init(params)

        ref = {k: np.asarray(v, np.float64) for k, v in params.items()}
        m = {k: np.zeros_like(v) for k, v in ref.items()}
        v = {k: np.zeros_like(vv) for k, vv in ref.items()}

        for step in range(6):
            grads = _grads(1, step)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)

            t = step + 1
            lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
            for k in ref:
                g = np.asarray(grads[k], np.float64)
                m[k] = b1 * m[k] + (1 - b1) * g
                v[k] = b2 * v[k] + (1 - b2) * g * g
                ref[k] = ref[k] - lr_t * m[k] / (np.sqrt(v[k]) + eps)

        for k in ref:
            np.testing.assert_allclose(
                np.asarray(params[k]), ref[k], rtol=1e-5, atol=1e-6
            )

    def test_differs_from_optax_at_tiny_gradients(self):
        """Keras adds eps to the UNCORRECTED sqrt(v_t): at t=1 the effective
        epsilon is eps/sqrt(1-b2) ~ 31.6x optax's -- visible when gradients
        are of order eps."""
        params = _tree(2)
        g = jax.tree.map(lambda x: jnp.full_like(x, 1e-8), params)

        ko = keras_adam(1e-3)
        oo = optax.adam(1e-3)
        ku, _ = ko.update(g, ko.init(params))
        ou, _ = oo.update(g, oo.init(params), params)
        # analytic: keras |step| = lr*0.316*(1e-9/(3.16e-10+1e-8)) vs
        # optax lr*0.5 -> ratio ~ 0.061
        ratio = float(ku["w"][0, 0] / ou["w"][0, 0])
        assert 0.01 < ratio < 0.5, ratio  # materially smaller step under Keras

    def test_equivalent_to_optax_once_v_accumulates(self):
        """With O(1) gradients the epsilon placement is negligible: both
        implementations walk the same trajectory."""
        params_k = params_o = _tree(3)
        ko, oo = keras_adam(1e-3), optax.adam(1e-3)
        sk, so = ko.init(params_k), oo.init(params_o)
        for step in range(5):
            g = _grads(3, step)
            uk, sk = ko.update(g, sk)
            uo, so = oo.update(g, so, params_o)
            params_k = optax.apply_updates(params_k, uk)
            params_o = optax.apply_updates(params_o, uo)
        np.testing.assert_allclose(
            np.asarray(params_k["w"]), np.asarray(params_o["w"]),
            rtol=0, atol=1e-5,
        )


class TestKerasRMSprop:
    def test_matches_numpy_transcription(self):
        lr, rho, eps = 1e-3, 0.9, 1e-8
        opt = keras_rmsprop(lr, rho, eps)
        params = _tree(4)
        state = opt.init(params)

        ref = {k: np.asarray(v, np.float64) for k, v in params.items()}
        a = {k: np.zeros_like(v) for k, v in ref.items()}

        for step in range(6):
            grads = _grads(5, step)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            for k in ref:
                g = np.asarray(grads[k], np.float64)
                a[k] = rho * a[k] + (1 - rho) * g * g
                ref[k] = ref[k] - lr * g / (np.sqrt(a[k]) + eps)

        for k in ref:
            np.testing.assert_allclose(
                np.asarray(params[k]), ref[k], rtol=1e-5, atol=1e-6
            )

    def test_epsilon_outside_sqrt(self):
        """optax.rmsprop computes g*rsqrt(a+eps); Keras g/(sqrt(a)+eps).
        With a == 0 (zero first gradient elsewhere) the two differ by
        orders of magnitude for tiny gradients."""
        params = _tree(6)
        g = jax.tree.map(lambda x: jnp.full_like(x, 1e-9), params)
        ko, oo = keras_rmsprop(1e-3), optax.rmsprop(1e-3)
        ku, _ = ko.update(g, ko.init(params))
        ou, _ = oo.update(g, oo.init(params), params)
        # keras: g/(sqrt(0.1*g^2)+eps); optax: g*rsqrt(0.1*g^2+eps)
        k_step, o_step = float(ku["w"][0, 0]), float(ou["w"][0, 0])
        assert abs(k_step) > 10 * abs(o_step), (k_step, o_step)


class TestWiring:
    @pytest.mark.parametrize("name", ["adam_keras", "rmsprop_keras"])
    def test_make_optimizer_resolves_and_steps(self, name):
        cfg = small_test_config(batch_size=2, epochs=1).replace(optimizer=name)
        opt = make_optimizer(cfg)
        params = _tree(7)
        state = opt.init(params)
        updates, state = opt.update(_grads(7, 0), state)
        stepped = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(stepped["w"])))
        assert not np.allclose(np.asarray(stepped["w"]), np.asarray(params["w"]))

    def test_unknown_rejected(self):
        cfg = small_test_config(batch_size=2, epochs=1).replace(optimizer="sgd")
        with pytest.raises(ValueError, match="unknown optimizer"):
            make_optimizer(cfg)

    @pytest.mark.parametrize("name", ["adam_keras", "rmsprop_keras"])
    def test_state_survives_donation(self, name):
        # The trainer jits its step with donate_argnums over (params,
        # opt_state).  If init_fn aliases the same zeros array into two
        # state leaves (e.g. sharing one zeros tree between Adam's m and
        # v), XLA raises "Attempt to donate the same buffer twice".
        cfg = small_test_config(batch_size=2, epochs=1).replace(optimizer=name)
        opt = make_optimizer(cfg)
        params = _tree(7)

        def probe(params, state):
            updates, state = opt.update(_grads(7, 0), state, params)
            return optax.apply_updates(params, updates), state

        donated = jax.jit(probe, donate_argnums=(0, 1))
        stepped, _ = donated(params, opt.init(params))
        assert np.all(np.isfinite(np.asarray(stepped["w"])))
