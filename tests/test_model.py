"""Model tests: shapes/finiteness across the config flag matrix, gradient
flow, probe semantics, autoregressive decode behavior, overfit-one-batch.

Mirrors the reference's build-time asserts (vae_definition.py:177-208) plus
the test strategy SURVEY.md §4 prescribes for the rebuild.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.config import small_test_config
from midi_vae_tpu.models import MidiVAE, loss_and_metrics


def make_batch(cfg, B=4, key=0):
    rng = np.random.RandomState(key)
    T, Tin = cfg.output_length, cfg.input_length

    def onehot_seq(T, D):
        idx = rng.randint(0, D, size=(B, T))
        out = np.zeros((B, T, D), np.float32)
        for b in range(B):
            out[b, np.arange(T), idx[b]] = 1
        return out

    batch = {
        "X": jnp.asarray(onehot_seq(Tin, cfg.input_dim)),
        "Y": jnp.asarray(onehot_seq(T, cfg.output_dim)),
        "I": jnp.asarray(onehot_seq(cfg.max_voices, cfg.instrument_dim)),
        "V": jnp.asarray(rng.rand(B, T, 1).astype(np.float32)),
        "D": jnp.asarray(onehot_seq(T, 2)),
        "C": jnp.asarray(
            np.eye(cfg.num_classes, dtype=np.float32)[rng.randint(0, cfg.num_classes, B)]
        ),
        "S": jnp.asarray(rng.randn(B, 15).astype(np.float32)),
        "H": jnp.zeros((B, cfg.latent_dim), jnp.float32),
    }
    if cfg.meta_next_notes:
        batch["N"] = jnp.asarray(onehot_seq(T, cfg.output_dim))
    if cfg.decoder_additional_input:
        batch["A"] = jnp.zeros((B, cfg.decoder_additional_input_dim), jnp.float32)
    return batch


FLAG_MATRIX = [
    {},                                        # default: GRU, instr+vel heads
    {"cell_type": "LSTM"},
    {"cell_type": "SimpleRNN"},
    {"meta_instrument": False, "meta_velocity": False},  # pitch-only slice
    {"meta_held_notes": True, "meta_next_notes": True},
    {"include_composer_decoder": False},
    {"signature_decoder": True, "latent_dim": 32},
    {"history": False},
    {"teacher_force": True},
    {"bidirectional": True, "num_layers_encoder": 3},
    {"split_lstm_vector": False, "extra_layer": False},
    {"composer_decoder_at_notes_output": True,
     "composer_decoder_at_instrument_output": True},
    {"decoder_input_composer": True},
    {"num_layers_decoder": 1},
    {"vae_loss": "mse"},
]


class TestFlagMatrixSmoke:
    """Fast-tier representative of the 15-config flag matrix below: the
    default config + the everything-on config. The full matrix runs in
    the slow tier."""

    @pytest.mark.parametrize(
        "overrides",
        [{}, {"meta_held_notes": True, "meta_next_notes": True,
              "signature_decoder": True, "latent_dim": 32}],
    )
    def test_forward_and_loss_finite(self, overrides):
        cfg = small_test_config(**overrides)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        loss, metrics = jax.jit(
            lambda p, b: loss_and_metrics(model, p, b, jax.random.PRNGKey(1), 0.01)
        )(params, batch)
        assert jnp.isfinite(loss)
        for k, v in metrics.items():
            assert jnp.isfinite(v), k


@pytest.mark.slow
class TestFlagMatrix:
    @pytest.mark.parametrize("overrides", FLAG_MATRIX)
    def test_forward_and_loss_finite(self, overrides):
        cfg = small_test_config(**overrides)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        loss, metrics = jax.jit(
            lambda p, b: loss_and_metrics(model, p, b, jax.random.PRNGKey(1), 0.01)
        )(params, batch)
        assert jnp.isfinite(loss)
        for k, v in metrics.items():
            assert jnp.isfinite(v), k
        out = model.apply(params, batch, jax.random.PRNGKey(1), 0.01)
        probs, logits = out["heads"]["notes"]
        assert probs.shape == (4, cfg.output_length, cfg.output_dim)
        np.testing.assert_allclose(
            np.asarray(probs.sum(-1)), 1.0, rtol=1e-5
        )  # softmax rows

    def test_vae_loss_mse_matches_closed_form(self):
        """vae_loss='mse' (vae_definition.py:338): Keras mse on the notes
        output = per-timestep mean over the pitch axis of (probs - Y)^2,
        with the same temporal silent weighting as the xent path."""
        cfg = small_test_config(vae_loss="mse", silent_weight=1.0)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        rng = jax.random.PRNGKey(1)
        _, metrics = loss_and_metrics(model, params, batch, rng, 0.01)
        out = model.apply(params, batch, rng, 0.01)
        probs, _ = out["heads"]["notes"]
        expected = float(jnp.mean((probs - batch["Y"]) ** 2))
        assert abs(float(metrics["notes_loss"]) - expected) < 1e-6
        # and it is a different objective from the xent default
        _, m_x = loss_and_metrics(
            MidiVAE(cfg.replace(vae_loss="categorical_crossentropy")),
            params, batch, rng, 0.01,
        )
        assert abs(float(m_x["notes_loss"]) - expected) > 1e-3


@pytest.mark.slow
class TestGradients:
    def test_grad_reaches_all_params(self):
        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        g = jax.grad(
            lambda p: loss_and_metrics(model, p, batch, jax.random.PRNGKey(1), 0.01)[0]
        )(params)
        leaves = jax.tree_util.tree_leaves_with_path(g)
        zero = [jax.tree_util.keystr(p) for p, x in leaves if float(jnp.abs(x).max()) == 0]
        assert not zero, f"dead params: {zero}"

    def test_composer_gradient_pins_latent_dims(self):
        """The composer xent must flow into z's first k dims -- the mechanism
        behind style transfer (vae_definition.py:730-734)."""
        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)

        def composer_loss_only(p):
            out = model.apply(p, batch, None, 0.0)
            C = batch["C"]
            return -jnp.mean(
                jnp.sum(C * jax.nn.log_softmax(out["composer_logits"], -1), -1)
            )

        g = jax.grad(composer_loss_only)(params)
        gz = g["encoder"]["z_mean"]["w"]  # (half, latent)
        # gradient only in the first num_composers latent dims
        assert float(jnp.abs(gz[:, : cfg.num_composers]).max()) > 0
        assert float(jnp.abs(gz[:, cfg.num_composers :]).max()) == 0


class TestLatentSemantics:
    def test_eval_encode_deterministic(self):
        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        z1 = model.encode(params, batch)  # epsilon_std=0
        z2 = model.encode(params, batch)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
        z3 = model.encode(params, batch, jax.random.PRNGKey(3), 0.5)
        assert not np.allclose(np.asarray(z1), np.asarray(z3))
        # epsilon_std=0.01 noise stays tiny (train-time sampling scale)
        z4 = model.encode(params, batch, jax.random.PRNGKey(3), 0.01)
        assert float(jnp.abs(z4 - z1).mean()) < 0.1

    def test_decode_from_z_only(self):
        """The reference decoder.predict path: decode arbitrary z."""
        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        z = jnp.asarray(np.random.RandomState(0).randn(3, cfg.latent_dim), jnp.float32)
        outs = model.decode(params, z)
        probs, _ = outs["notes"]
        assert probs.shape == (3, cfg.output_length, cfg.output_dim)
        vel, _ = outs["velocity"]
        assert vel.shape == (3, cfg.output_length, 1)
        assert float(vel.min()) >= 0 and float(vel.max()) <= 1
        inst, _ = outs["instrument"]
        assert inst.shape == (3, cfg.max_voices, cfg.instrument_dim)

    def test_history_changes_output(self):
        cfg = small_test_config()
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        z = jnp.ones((2, cfg.latent_dim), jnp.float32)
        out0 = model.decode(params, z, history=jnp.zeros((2, cfg.latent_dim)))
        out1 = model.decode(params, z, history=jnp.ones((2, cfg.latent_dim)))
        assert not np.allclose(
            np.asarray(out0["notes"][0]), np.asarray(out1["notes"][0])
        )


class TestTeacherForce:
    def test_teacher_force_matches_feedback_on_first_step(self):
        """Step 0 consumes the start symbol in both modes, so outputs at t=0
        must agree; later steps differ (feedback vs ground truth)."""
        cfg = small_test_config(teacher_force=True)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        z = model.encode(params, batch)
        tf_out = model.decode(params, z, history=batch["H"], ground_truth=batch["Y"])
        ar_out = model.decode(params, z, history=batch["H"], ground_truth=None)
        np.testing.assert_allclose(
            np.asarray(tf_out["notes"][0][:, 0]),
            np.asarray(ar_out["notes"][0][:, 0]),
            rtol=1e-5,
        )
        assert not np.allclose(
            np.asarray(tf_out["notes"][0][:, -1]),
            np.asarray(ar_out["notes"][0][:, -1]),
        )


class TestOverfit:
    def test_overfit_one_batch(self):
        """Seeded end-to-end: a few hundred Adam steps must drive the notes
        reconstruction of a single batch to high accuracy (SURVEY.md §4)."""
        import optax

        cfg = small_test_config(
            lstm_size=32, latent_dim=32, beta=0.01, epsilon_std=0.0
        )
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg, B=2)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            (loss, metrics), g = jax.value_and_grad(
                lambda p: loss_and_metrics(model, p, batch, None, 0.0),
                has_aux=True,
            )(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, metrics

        acc = 0.0
        for i in range(400):
            params, opt_state, metrics = step(params, opt_state)
            acc = float(metrics["notes_acc"])
            if acc > 0.95:
                break
        assert acc > 0.95, f"failed to overfit: notes_acc={acc}"


@pytest.mark.slow
class TestComputeDtype:
    def test_bf16_forward_close_to_f32(self):
        cfg32 = small_test_config()
        cfg16 = small_test_config(compute_dtype="bfloat16")
        m32, m16 = MidiVAE(cfg32), MidiVAE(cfg16)
        params = m32.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg32)
        l32, _ = loss_and_metrics(m32, params, batch, None, 0.0)
        l16, met16 = loss_and_metrics(m16, params, batch, None, 0.0)
        assert abs(float(l32) - float(l16)) / float(l32) < 0.02
        for v in met16.values():
            assert jnp.isfinite(v)

    def test_bf16_trains(self):
        import optax

        cfg = small_test_config(compute_dtype="bfloat16", epsilon_std=0.0)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg, B=2)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            (loss, m), g = jax.value_and_grad(
                lambda p: loss_and_metrics(model, p, batch, None, 0.0),
                has_aux=True,
            )(params)
            u, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, u), opt_state, loss

        losses = []
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # grads keep params in f32 (mixed precision, not full bf16)
        assert all(
            x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(params)
        )


class TestReviewFixes:
    def test_missing_additional_zero_fills(self):
        cfg = small_test_config(decoder_input_composer=True)
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        batch.pop("A")
        out = model.apply(params, batch)  # must not crash
        assert jnp.all(jnp.isfinite(out["heads"]["notes"][0]))

    def test_next_notes_teacher_force(self):
        cfg = small_test_config(
            meta_next_notes=True, meta_next_notes_teacher_force=True
        )
        model = MidiVAE(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)
        z = model.encode(params, batch)
        tf_out = model.decode(
            params, z, history=batch["H"], next_ground_truth=batch["N"]
        )
        ar_out = model.decode(params, z, history=batch["H"])
        # step 0 agrees (both consume the start symbol), later steps diverge
        np.testing.assert_allclose(
            np.asarray(tf_out["next"][0][:, 0]),
            np.asarray(ar_out["next"][0][:, 0]),
            rtol=1e-5,
        )
        assert not np.allclose(
            np.asarray(tf_out["next"][0][:, -1]), np.asarray(ar_out["next"][0][:, -1])
        )


@pytest.mark.slow
class TestGateActivation:
    def test_hard_sigmoid_trains_and_disables_pallas(self):
        """gate_activation='hard_sigmoid' (bit-faithful Keras-2.0.8 gates,
        PARITY.md deviation #12) must train -- finite loss + grads on every
        param -- and must force the scan path: the Pallas kernels implement
        exact-sigmoid gates only."""
        from midi_vae_tpu.models.vae import loss_and_metrics

        cfg = small_test_config(gate_activation="hard_sigmoid", use_pallas="on")
        model = MidiVAE(cfg)
        assert model._pallas_enabled() is False
        params = model.init_params(jax.random.PRNGKey(0))
        batch = make_batch(cfg)

        def loss_fn(p):
            total, _ = loss_and_metrics(model, p, batch, None, 0.0)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(total)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)

    def test_gate_activation_changes_output(self):
        """Same params, different gate function => different forward."""
        cfg_s = small_test_config()
        cfg_h = small_test_config(gate_activation="hard_sigmoid")
        model_s, model_h = MidiVAE(cfg_s), MidiVAE(cfg_h)
        params = model_s.init_params(jax.random.PRNGKey(1))
        batch = make_batch(cfg_s)
        z_s = model_s.encode(params, batch)
        z_h = model_h.encode(params, batch)
        assert not np.allclose(np.asarray(z_s), np.asarray(z_h))
