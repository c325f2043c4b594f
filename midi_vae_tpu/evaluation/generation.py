"""Generation helpers: batched decode/encode, interpolations, medleys,
random songs, long songs.

TPU-first redesign of the reference generation sections
(/root/reference/vae_evaluation.py:577-896, :1766-1896): where the reference
calls ``decoder.predict`` once per latent vector, everything here decodes
BATCHES of latents in one jitted call (padded to power-of-two buckets to
bound recompiles).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.tensorize import instrument_matrix_to_programs
from ..models.vae import MidiVAE
from ..utils import music
from . import sampling


from ..data.batching import bucket_pow2 as _bucket  # shared padding policy


def additional_rows(
    cfg: Config, C: int | None, S: np.ndarray | None, n: int
) -> np.ndarray | None:
    """Decoder additional input rows, [C one-hot ⊕ S] per the configured
    flags (prepare_decoder_input, vae_definition.py:835-847). None when the
    config has no additional input. Shared by the live GenerationContext
    and the sealed ServingBundle song entry points."""
    if not cfg.decoder_additional_input:
        return None
    parts = []
    if cfg.decoder_input_composer:
        onehot = np.zeros((n, cfg.num_classes), np.float32)
        if C is not None:
            onehot[:, C] = 1.0
        parts.append(onehot)
    if cfg.append_signature_vector_to_latent:
        sig = np.zeros((n, cfg.signature_vector_length), np.float32)
        if S is not None:
            S = np.atleast_2d(np.asarray(S, np.float32))
            sig[: min(n, len(S))] = S[:n]
        parts.append(sig)
    return np.concatenate(parts, axis=-1)


def decode_argmax_graph(model: MidiVAE, cfg: Config):
    """Build the pure fn (params, z, H, A) -> per-head argmax dict.

    One autoregressive decode + on-device argmax per enabled head (indices
    cross the tunnel, not probability tensors). Shared by
    ``GenerationContext`` (live jitted serving) and
    ``serving.export_serving_bundle`` (AOT export with params baked in), so
    the exported bundles run the exact graph the evaluation harness runs."""

    def decode_argmax_fn(params, z, H, A):
        outs = model.decode(
            params, z, history=H,
            additional=A if cfg.decoder_additional_input else None,
            inference=True,
        )
        res = {"notes_idx": jnp.argmax(outs["notes"][0], axis=-1)}
        if "instrument" in outs:
            res["inst_idx"] = jnp.argmax(outs["instrument"][0], axis=-1)
        if "velocity" in outs:
            res["vel"] = outs["velocity"][0][..., 0]
        if "held" in outs:
            res["held_idx"] = jnp.argmax(outs["held"][0], axis=-1)
        if "next" in outs:
            res["next_idx"] = jnp.argmax(outs["next"][0], axis=-1)
        return res

    return decode_argmax_fn


def transfer_argmax_graph(model: MidiVAE, cfg: Config, eps: float):
    """Build the fused style-transfer fn
    (params, batch, perm, A, rng) -> (argmax dict, switched z).

    encode -> latent-dim swap -> history roll -> decode -> argmax, ONE
    device program. ``perm`` is a latent-index permutation (the
    z[C] <-> z[C_switch] swap of vae_evaluation.py:2474-2478 as a gather,
    so every class pair shares the compiled program); ``A`` is the decoder
    additional input for the TARGET class (vae_evaluation.py:2481 passes
    C_switch + S). ``eps`` is the encode sampling epsilon (0.0 for the
    deterministic eval/serving path; rng may then be None)."""
    decode_argmax = decode_argmax_graph(model, cfg)

    def transfer_argmax_fn(params, batch, perm, A, rng):
        z = model.encode(params, batch, rng, eps)
        switched = z[:, perm]
        H = jnp.zeros_like(switched).at[1:].set(switched[:-1])
        return decode_argmax(params, switched, H, A), switched

    return transfer_argmax_fn


class GenerationContext:
    """Owns jitted encode/decode on a trained model; all IO in numpy.

    ``mesh``: optional ``jax.sharding.Mesh`` from ``parallel.make_mesh`` --
    params get the mesh's param shardings (replicated for DP, tensor-sharded
    over 'model' when that axis is >1), batches shard their leading axis
    over 'data', and GSPMD partitions the same jitted programs across the
    chips. Default (None) serves on a single device.
    """

    def __init__(self, cfg: Config, model: MidiVAE, params, mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, shard_params

            self.params = shard_params(params, mesh)
            self._data_sharding = batch_sharding(mesh)
        else:
            # params may be host-committed (init_params initializes on CPU);
            # place them on the compute device ONCE with an EXPLICIT target
            # (a bare device_put is a no-op for committed arrays) -- otherwise
            # every jitted call re-streams the whole tree over the TPU tunnel
            self.params = jax.device_put(params, jax.devices()[0])
            self._data_sharding = None

        def decode_fn(params, z, H, A):
            outs = model.decode(
                params, z, history=H,
                additional=A if cfg.decoder_additional_input else None,
                inference=True,
            )
            return {k: probs for k, (probs, _logits) in outs.items()}

        # do_not_sample_in_evaluation (settings.py:32): the reference
        # rebuilds the eval model with epsilon_std=0 when set
        # (vae_evaluation.py:481-486); when cleared, eval encodes sample z
        # with the training epsilon
        self._eval_eps = 0.0 if cfg.do_not_sample_in_evaluation else cfg.epsilon_std
        self._encode_key = jax.random.PRNGKey(cfg.seed)

        def encode_fn(params, batch, rng):
            return model.encode(params, batch, rng, self._eval_eps)

        self._decode = jax.jit(decode_fn)
        self._decode_argmax = jax.jit(decode_argmax_graph(model, cfg))
        self._encode = jax.jit(encode_fn)
        self._transfer_argmax = jax.jit(
            transfer_argmax_graph(model, cfg, self._eval_eps)
        )

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        """Static-shape bucket; on a mesh, also divisible by the data axis."""
        b = _bucket(n)
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            nd = self.mesh.shape[DATA_AXIS]
            b += (-b) % nd
        return b

    def _put(self, arr):
        a = jnp.asarray(arr)
        if self._data_sharding is not None:
            a = jax.device_put(a, self._data_sharding)
        return a

    def _decode_padded(self, fn, z, history, additional) -> dict[str, np.ndarray]:
        cfg = self.cfg
        z = np.atleast_2d(np.asarray(z, np.float32))
        n = z.shape[0]
        b = self._bucket_for(n)
        zp = np.zeros((b, cfg.latent_dim), np.float32)
        zp[:n] = z
        Hp = np.zeros((b, cfg.latent_dim), np.float32)
        if history is not None:
            history = np.atleast_2d(history)
            Hp[:n] = history[:n]
        Ap = np.zeros((b, max(1, cfg.decoder_additional_input_dim)), np.float32)
        if additional is not None:
            Ap[:n] = np.atleast_2d(additional)[:n]
        outs = fn(self.params, self._put(zp), self._put(Hp), self._put(Ap))
        return {k: np.asarray(v)[:n] for k, v in outs.items()}

    def decode_batch(
        self,
        z: np.ndarray,
        history: np.ndarray | None = None,
        additional: np.ndarray | None = None,
    ) -> dict[str, np.ndarray]:
        """Decode (B, latent) -> head probability arrays, batched on device."""
        return self._decode_padded(self._decode, z, history, additional)

    def _padded_encoder_batch(
        self, X: np.ndarray, I: np.ndarray, V: np.ndarray, D: np.ndarray
    ) -> tuple[dict, int]:
        """Windows of one song -> bucket-padded device batch + real count."""
        from ..data.batching import held_to_categorical, prepare_velocity

        cfg = self.cfg
        n = X.shape[0]
        b = self._bucket_for(n)
        D_cat = held_to_categorical(np.atleast_2d(D))
        V3 = prepare_velocity(np.atleast_2d(V), D_cat, cfg)
        batch = {
            "X": np.zeros((b, cfg.input_length, cfg.input_dim), np.float32),
            "I": np.zeros((b, cfg.max_voices, cfg.instrument_dim), np.float32),
            "V": np.zeros((b, cfg.output_length, 1), np.float32),
            "D": np.zeros((b, cfg.output_length, 2), np.float32),
        }
        batch["X"][:n] = X
        batch["I"][:n] = np.tile(I[None], (n, 1, 1))
        batch["V"][:n] = V3
        batch["D"][:n] = D_cat
        return {k: self._put(v) for k, v in batch.items()}, n

    def encode_song(
        self, X: np.ndarray, I: np.ndarray, V: np.ndarray, D: np.ndarray
    ) -> np.ndarray:
        """Windows of one song -> deterministic latents (B, latent)."""
        batch, n = self._padded_encoder_batch(X, I, V, D)
        self._encode_key, sub = jax.random.split(self._encode_key)
        z = np.asarray(self._encode(self.params, batch, sub))
        return z[:n]

    def additional_for(
        self, C: int | None, S: np.ndarray | None, n: int
    ) -> np.ndarray | None:
        return additional_rows(self.cfg, C, S, n)

    def style_transfer_song(
        self,
        X: np.ndarray,
        I: np.ndarray,
        V: np.ndarray,
        D: np.ndarray,
        C: int,
        C_switch: int,
        S: np.ndarray | None = None,
    ):
        """The style-transfer serving round trip in ONE device program.

        encode -> z[C] <-> z[C_switch] swap (vae_evaluation.py:2474-2478) ->
        history roll -> autoregressive decode -> per-head argmax, all inside
        a single jitted dispatch (the per-pair swap is a traced gather, so
        every class pair shares the compiled program). Returns the processed
        rolls tuple of decode_and_process(argmax) plus the switched latents.

        The sectioned evaluation harness keeps the separate
        encode_song/decode_and_process calls (it reuses one encode across
        targets and mirrors the reference's bookkeeping); this entry point
        is for serving, where per-dispatch latency dominates.
        """
        cfg = self.cfg
        batch, n = self._padded_encoder_batch(X, I, V, D)
        b = next(iter(batch.values())).shape[0]
        perm = np.arange(cfg.latent_dim)
        perm[[C, C_switch]] = perm[[C_switch, C]]
        # additional input carries the TARGET class (+ signature), like the
        # reference's switch decode (vae_evaluation.py:2481)
        Ap = np.zeros((b, max(1, cfg.decoder_additional_input_dim)), np.float32)
        A = self.additional_for(C_switch, S, n)
        if A is not None:
            Ap[:n] = A
        self._encode_key, sub = jax.random.split(self._encode_key)
        idx, switched = self._transfer_argmax(
            self.params, batch, jnp.asarray(perm), self._put(Ap), sub
        )
        idx = {k: np.asarray(v)[:n] for k, v in idx.items()}
        return sampling.process_argmax_outputs(idx, cfg), np.asarray(switched)[:n]

    # ------------------------------------------------------------------
    def decode_and_process(
        self,
        z: np.ndarray,
        history: np.ndarray | None = None,
        additional: np.ndarray | None = None,
        sample_method: str = "argmax",
        rng=None,
        independent_windows: bool = False,
    ):
        """``independent_windows``: post-process each window separately --
        set when the batched device call replaces reference code that ran
        ``decoder.predict`` per window (the velocity-override chain of
        vae_definition.py:1160-1190 then resets per window, matching the
        reference's per-call batch layout)."""
        if sample_method == "argmax":
            # argmax on device: fetch indices, not probability tensors
            idx = self._decode_padded(self._decode_argmax, z, history, additional)
            return sampling.process_argmax_outputs(
                idx, self.cfg, independent_windows=independent_windows
            )
        outs = self.decode_batch(z, history, additional)
        return sampling.process_decoder_outputs(
            outs, sample_method, self.cfg, rng,
            independent_windows=independent_windows,
        )


# ---------------------------------------------------------------------------
# Latent-space helpers (vae_evaluation.py:577-662)
# ---------------------------------------------------------------------------

def linear_interpolation(p0: np.ndarray, p1: np.ndarray, t: float) -> np.ndarray:
    return p0 * (1.0 - t) + p1 * t


def slerp(p0: np.ndarray, p1: np.ndarray, t: float) -> np.ndarray:
    omega = np.arccos(
        np.clip(
            np.dot(p0 / np.linalg.norm(p0), p1 / np.linalg.norm(p1)), -1.0, 1.0
        )
    )
    so = np.sin(omega)
    if so == 0:
        return linear_interpolation(p0, p1, t)
    return np.sin((1.0 - t) * omega) / so * p0 + np.sin(t * omega) / so * p1


def split_song_back_to_samples(X: np.ndarray, length: int) -> list[np.ndarray]:
    return np.split(X, int(X.shape[0] / length))


def vote_for_programs(I_pred: np.ndarray, cfg: Config) -> list[int]:
    """Majority vote of predicted instruments per voice over all windows
    (vae_evaluation.py:598-617)."""
    votes = [dict() for _ in range(cfg.max_voices)]
    for matrix in I_pred:
        programs = instrument_matrix_to_programs(matrix, cfg.instrument_attach_method)
        for voice, program in enumerate(programs[: cfg.max_voices]):
            votes[voice][program] = votes[voice].get(program, 0) + 1
    result = []
    for voice in range(cfg.max_voices):
        best, best_count = 0, 0
        for program, count in votes[voice].items():
            if count > best_count:
                best, best_count = program, count
        result.append(best)
    return result


def prepare_for_drawing(Y: np.ndarray, cfg: Config, V: np.ndarray | None = None) -> np.ndarray:
    """Grey-scale notes by velocity for plots (vae_evaluation.py:619-642)."""
    newY = np.copy(Y)
    mv = cfg.max_voices
    if V is not None:
        thr = cfg.velocity_threshold
        for step in range(V.shape[0]):
            if V[step] > thr:
                newY[step, :] *= (V[step] - thr) * cfg.max_velocity
            else:
                if step > mv:
                    prev = np.argmax(newY[step - mv])
                    cur = np.argmax(newY[step])
                    if cur != prev:
                        newY[step, :] = 0
                    else:
                        newY[step, :] = newY[step - mv, :]
                else:
                    newY[step, :] = 0
        poly = music.monophonic_to_khot_pianoroll(newY, mv, set_all_nonzero_to_1=False)
    else:
        poly = music.monophonic_to_khot_pianoroll(newY, mv)
    return np.transpose(poly)


def restructure_song_to_fit_more_instruments(
    Y: np.ndarray, I_list, V: np.ndarray, D: np.ndarray, cfg: Config
):
    """Give every window its own instrument set by widening the voice axis
    (vae_evaluation.py:645-662)."""
    T = cfg.output_length
    mv = cfg.max_voices
    num_samples = len(I_list)
    Y_final = np.zeros((num_samples * T * num_samples, Y.shape[1]), Y.dtype)
    V_final = np.zeros((num_samples * T * num_samples,))
    D_final = np.zeros((num_samples * T * num_samples,))
    final_programs: list[int] = []
    for sample, I in enumerate(I_list):
        final_programs.extend(
            instrument_matrix_to_programs(I, cfg.instrument_attach_method)
        )
        for step in range(T // mv):
            for voice in range(mv):
                src = sample * T + step * mv + voice
                dst = sample * T * num_samples + step * num_samples * mv + sample * mv + voice
                Y_final[dst, :] = Y[src, :]
                V_final[dst] = V[src]
                D_final[dst] = D[src]
    return Y_final, final_programs, V_final, D_final


# ---------------------------------------------------------------------------
# Song generators
# ---------------------------------------------------------------------------

def generate_random_song(
    ctx: GenerationContext,
    z_std: float,
    rng: np.random.RandomState,
    sample_method: str = "choice",
    style_class: int | None = None,
    z: np.ndarray | None = None,
):
    """One random-latent song; optional composer-knob forcing
    (vae_evaluation.py:1771-1814): z[0:k] = -1, z[C] = 1. Pass ``z`` to
    reuse one latent across classes (the reference flips the knob on a
    SHARED random_code so per-class outputs differ only by the knob)."""
    cfg = ctx.cfg
    if z is None:
        z = rng.normal(0.0, z_std, size=(1, cfg.latent_dim)).astype(np.float32)
    z = np.copy(np.atleast_2d(z)).astype(np.float32)
    if style_class is not None:
        z[0, : cfg.num_classes] = -1
        z[0, style_class] = 1
    return ctx.decode_and_process(
        z,
        additional=ctx.additional_for(
            style_class if style_class is not None else 0, None, len(z)
        ),
        sample_method=sample_method, rng=rng,
    )


def generate_interpolation_song(
    ctx: GenerationContext,
    z_a: np.ndarray,
    z_b: np.ndarray,
    steps: int,
    sample_method: str = "argmax",
    rng=None,
):
    """Walk z_a -> z_b in ``steps+1`` windows, history chained
    (vae_evaluation.py:841-887). Returns (Y, I_list, V, D)."""
    cfg = ctx.cfg
    zs = np.stack(
        [
            linear_interpolation(z_a, z_b, i / float(steps))
            for i in range(steps + 1)
        ]
    )
    history = np.zeros_like(zs)
    history[1:] = zs[:-1]
    # the reference decodes one window per predict call -> window-
    # independent post-processing
    Y, I, V, D, _ = ctx.decode_and_process(
        zs, history=history, sample_method=sample_method, rng=rng,
        independent_windows=True,
    )
    del cfg
    return Y, I, V, D


def generate_medley(
    ctx: GenerationContext,
    songs: list[dict],
    interpolation_length: int,
    samples_per_song: int,
    sample_method: str = "argmax",
    rng: np.random.RandomState | None = None,
):
    """Chosen-song interpolation medley (vae_evaluation.py:705-837).

    ``songs``: list of {X, I, V, D} window dicts. For each consecutive pair,
    bridge with ``interpolation_length`` interpolated windows, then decode
    ``samples_per_song`` real windows. Returns (Y, I_list, V, D, info).
    """
    rng = rng or np.random.RandomState()
    Y_out, I_out, V_out, D_out = [], [], [], []
    info: dict[str, object] = {}
    previous_medley_z = None
    previous_rep = np.zeros((1, ctx.cfg.latent_dim), np.float32)

    for idx, song in enumerate(songs):
        X, I, V, D = song["X"], song["I"], song["V"], song["D"]
        n = X.shape[0]
        take = min(samples_per_song, n)
        start = 0 if n <= take else int(rng.randint(0, n - take))
        R = ctx.encode_song(X[start : start + take], I, V[start : start + take], D[start : start + take])
        info[f"programs_{idx}"] = instrument_matrix_to_programs(
            I, ctx.cfg.instrument_attach_method
        )

        if previous_medley_z is not None:
            for i in range(interpolation_length):
                z = linear_interpolation(
                    previous_medley_z, R[0], i / float(interpolation_length)
                )[None]
                Y, Ip, Vp, Dp, _ = ctx.decode_and_process(
                    z, history=previous_rep, sample_method=sample_method, rng=rng
                )
                Y_out.append(Y)
                I_out.extend(Ip)
                V_out.append(Vp)
                D_out.append(Dp)
                # the reference records the DECODED bridge instruments per
                # interpolation step (vae_evaluation.py:810)
                info[f"programs_{idx}_interpolation_{i}"] = (
                    instrument_matrix_to_programs(
                        Ip[0], ctx.cfg.instrument_attach_method
                    )
                )
                previous_rep = z
        for i in range(R.shape[0]):
            z = R[i][None]
            Y, Ip, Vp, Dp, _ = ctx.decode_and_process(
                z, history=previous_rep, sample_method=sample_method, rng=rng
            )
            Y_out.append(Y)
            I_out.extend(Ip)
            V_out.append(Vp)
            D_out.append(Dp)
            previous_rep = z
        previous_medley_z = R[-1]

    return (
        np.concatenate(Y_out, axis=0),
        np.asarray(I_out),
        np.concatenate(V_out),
        np.concatenate(D_out),
        info,
    )


def generate_long_song(
    ctx: GenerationContext,
    all_z: np.ndarray,
    z_std: float,
    length: int,
    rng: np.random.RandomState,
    sample_method: str = "choice",
):
    """Decode -> re-encode -> blend with nearest cached train z, chained
    (vae_evaluation.py:1821-1896).

    Nearest-z selection replicates the reference scan exactly
    (vae_evaluation.py:1847-1856): the running minimum starts at index 0's
    distance whether or not 0 was already picked, so when no unpicked z
    beats dist(all_z[0], R) the walk re-picks index 0 -- reference
    behavior, kept for parity."""
    cfg = ctx.cfg
    R = rng.normal(0.0, z_std, size=(1, cfg.latent_dim))
    previous_rep = np.zeros((1, cfg.latent_dim), np.float32)
    picked: set[int] = set()
    Y_out, I_out, V_out, D_out = [], [], [], []

    for _ in range(length):
        dists = np.linalg.norm(all_z - R, axis=1)
        lowest = dists[0]
        best = 0
        for i in range(len(all_z)):
            if dists[i] < lowest and i not in picked:
                lowest = dists[i]
                best = i
        picked.add(best)
        e = z_std
        R = (R + all_z[best] * e) / (1 + e)

        Y, I, V, D, _ = ctx.decode_and_process(
            R, history=previous_rep, sample_method=sample_method, rng=rng
        )
        Y_out.append(Y)
        I_out.extend(I)
        V_out.append(V)
        D_out.append(D)

        # feed the output back through the encoder
        X = sampling.add_silent_column(Y, cfg)[None]
        previous_rep = R
        R = ctx.encode_song(X, I[0], V[None], D[None])

    return (
        np.concatenate(Y_out, axis=0),
        np.asarray(I_out),
        np.concatenate(V_out),
        np.concatenate(D_out),
    )
