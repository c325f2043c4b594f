#!/usr/bin/env python
"""AOT-compile the multi-chip training programs for a REAL TPU topology.

This machine has ONE tunneled chip; multi-chip correctness is proven on
virtual CPU meshes (tests/test_distributed.py, __graft_entry__), but on CPU
the Pallas kernels dispatch jnp fallbacks -- the fused-kernel + GSPMD
program a v5e-8 slice would actually run is never built there. This tool
closes that gap without needing eight chips: it compiles the FULL
train-step and chunked-epoch programs against a chipless PJRT topology
description (``jax.experimental.topologies``, e.g. ``v5e:2x4`` = a v5e-8
slice), asserts compilation succeeds, and reports

  * the collectives XLA emitted (all-reduce / all-gather / reduce-scatter /
    collective-permute / all-to-all, with counts), and
  * per-chip memory from the compiled executable's memory analysis
    (arguments / outputs / temporaries / code).

This is the strongest multi-chip evidence this environment can produce
(SURVEY.md §2.3): the exact GSPMD partitioning + Mosaic kernels that would
run on the slice, compiled by the real TPU toolchain.

Usage:
    python tools/compile_topology.py [--topology v5e:2x4]
        [--mesh data=8 | data=4,model=2] [--epoch] [--shard-data]
        [--set KEY=VALUE ...] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_mesh(spec: str) -> dict[str, int]:
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def collective_inventory(hlo_text: str) -> dict[str, int]:
    """Count collective ops in the compiled (post-partitioning) HLO."""
    pats = {
        "all-reduce": r"\ball-reduce(?:-start)?\(",
        "all-gather": r"\ball-gather(?:-start)?\(",
        "reduce-scatter": r"\breduce-scatter\(",
        "collective-permute": r"\bcollective-permute(?:-start)?\(",
        "all-to-all": r"\ball-to-all\(",
    }
    return {
        name: len(re.findall(p, hlo_text)) for name, p in pats.items()
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--topology", default="v5e:2x4",
                    help="PJRT topology name (v5e:2x4 = v5e-8 slice)")
    ap.add_argument("--mesh", default="data=8",
                    help="mesh axes over the slice, e.g. data=4,model=2")
    ap.add_argument("--epoch", action="store_true",
                    help="also compile the chunked-epoch program "
                         "(run_epochs_device body) for the topology")
    ap.add_argument("--shard-data", action="store_true",
                    help="epoch program with the resident dataset sharded "
                         "over the 'data' axis (the HBM-guard layout)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from midi_vae_tpu.config import parse_overrides

    overrides = parse_overrides(getattr(args, "set"))

    import functools

    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from midi_vae_tpu.config import Config
    from midi_vae_tpu.parallel import mesh as pmesh
    from midi_vae_tpu.training import VAETrainer
    from midi_vae_tpu.training.trainer import BATCH_KEYS

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology
    )
    axes = parse_mesh(args.mesh)
    n = int(np.prod(list(axes.values())))
    if n != len(topo.devices):
        raise SystemExit(
            f"mesh {axes} needs {n} chips; topology {args.topology} has "
            f"{len(topo.devices)}"
        )
    # normalize to the framework's (data, model) axis pair
    shape = (axes.get("data", 1), axes.get("model", 1))
    mesh = Mesh(
        np.array(topo.devices).reshape(shape),
        (pmesh.DATA_AXIS, pmesh.MODEL_AXIS),
    )

    cfg = Config(**overrides)
    tr = VAETrainer(cfg, mesh=mesh)
    n_model = shape[1]

    def spec_of(leaf) -> NamedSharding:
        return NamedSharding(mesh, pmesh._tp_spec((), leaf, n_model))

    def struct(shape_dtype, sharding) -> jax.ShapeDtypeStruct:
        return jax.ShapeDtypeStruct(
            shape_dtype.shape, shape_dtype.dtype, sharding=sharding
        )

    # abstract state: init the (small) params for real on host CPU, keep
    # only shapes + topology shardings (nothing is materialized on the
    # topology -- it has no addressable devices)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params_real = tr.model.init_params(jax.random.PRNGKey(0))
    params_s = jax.tree_util.tree_map(
        lambda l: struct(l, spec_of(l)), params_real
    )
    opt_s = jax.eval_shape(tr.optimizer.init, params_s)
    opt_s = jax.tree_util.tree_map(lambda l: struct(l, spec_of(l)), opt_s)
    rng_s = jax.ShapeDtypeStruct(
        (2,), np.uint32, sharding=NamedSharding(mesh, P())
    )

    batch_sh = pmesh.batch_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def batch_struct() -> dict:
        from midi_vae_tpu.utils.synthetic import synthetic_flat
        from midi_vae_tpu.training.trainer import _slice_batch
        from midi_vae_tpu.parallel.mesh import pad_batch_to

        flat = synthetic_flat(
            cfg, n_songs=8, windows_per_song=-(-cfg.batch_size // 8)
        )
        b = _slice_batch(flat, np.arange(cfg.batch_size), cfg, None)
        b, mask = pad_batch_to(b, cfg.batch_size)
        b["M"] = mask
        return {
            k: jax.ShapeDtypeStruct(
                np.asarray(v).shape, np.asarray(v).dtype, sharding=batch_sh
            )
            for k, v in b.items()
        }

    results = {"topology": args.topology, "mesh": dict(axes),
               "n_chips": len(topo.devices), "programs": {}}

    def record(name: str, compiled, options=None) -> None:
        hlo = compiled.as_text()
        mem = compiled.memory_analysis()
        entry = {
            "collectives": collective_inventory(hlo),
            # proof the FUSED kernels (not fallbacks) are in the program
            "mosaic_kernels": len(re.findall(r"tpu_custom_call", hlo)),
        }
        if options:
            entry["compiler_options"] = options
        if mem is not None:
            entry["per_chip_bytes"] = {
                "arguments": int(getattr(mem, "argument_size_in_bytes", 0)),
                "outputs": int(getattr(mem, "output_size_in_bytes", 0)),
                "temps": int(getattr(mem, "temp_size_in_bytes", 0)),
                "generated_code": int(
                    getattr(mem, "generated_code_size_in_bytes", 0)
                ),
            }
        results["programs"][name] = entry
        print(f"compiled {name}: {entry}", file=sys.stderr)

    # ---- 1. the bare train step (tr.train_step is already the jit) ----
    lowered = tr.train_step.lower(params_s, opt_s, batch_struct(), rng_s)
    record("train_step", lowered.compile())

    # ---- 2. the chunked-epoch program (the production dispatch) ----
    if args.epoch:
        # mirror prepare_device_data's layout-mode flip (sharded-data
        # epochs keep the shard_map kernels and compile with the
        # all-reduce-scatter-fusion workaround; see MidiVAE.sharded_data
        # and VAETrainer._epoch_compiler_options)
        tr.model.sharded_data = bool(
            args.shard_data and mesh.shape[pmesh.DATA_AXIS] > 1
        )
        n_windows = 16 * cfg.batch_size
        E = 4
        n_batches = -(-n_windows // cfg.batch_size)
        data_rows = n_windows
        data_sh = repl
        if args.shard_data:
            d = mesh.shape[pmesh.DATA_AXIS]
            data_rows = -(-n_windows // d) * d
            data_sh = NamedSharding(mesh, P(pmesh.DATA_AXIS))

        from midi_vae_tpu.utils.synthetic import synthetic_flat

        flat = synthetic_flat(cfg, n_songs=8, windows_per_song=2)
        data_s = {}
        for k in BATCH_KEYS + ("first_in_song", "song_id"):
            a = np.asarray(getattr(flat, k))
            # mirror prepare_device_data's uint8 residency for the binary
            # planes -- the production epoch program gathers 1-byte rows
            if VAETrainer._resident_uint8(k, a):
                a = a.astype(np.uint8)
            data_s[k] = jax.ShapeDtypeStruct(
                (data_rows,) + a.shape[1:], a.dtype, sharding=data_sh
            )
        zc_rows = (
            data_rows + 1 if (cfg.history and cfg.history_from_train_z) else 1
        )
        zc_cols = cfg.latent_dim if zc_rows > 1 else 1
        zc_s = jax.ShapeDtypeStruct(
            (zc_rows, zc_cols), np.float32, sharding=repl
        )
        orders_s = jax.ShapeDtypeStruct(
            (E, n_batches, cfg.batch_size), np.int32, sharding=repl
        )
        masks_s = jax.ShapeDtypeStruct(
            (E, n_batches, cfg.batch_size), np.float32, sharding=repl
        )
        hs_s = jax.ShapeDtypeStruct((E,), np.float32, sharding=repl)
        ef_s = jax.ShapeDtypeStruct((E,), np.float32, sharding=repl)
        to_s = jax.ShapeDtypeStruct((1, 1), np.int32, sharding=repl)
        tm_s = jax.ShapeDtypeStruct((1, 1), np.float32, sharding=repl)

        epoch_fn = functools.partial(
            tr._device_epochs_fn, history_active=cfg.history, with_eval=False
        )
        lowered = jax.jit(epoch_fn, donate_argnums=(0, 1, 3)).lower(
            params_s, opt_s, rng_s, zc_s, data_s, orders_s, masks_s, hs_s,
            ef_s, {}, to_s, tm_s,
        )
        # sharded-data programs need the trainer's workaround options (the
        # all-reduce-scatter fusion pass mis-rewrite, see
        # VAETrainer._epoch_compiler_options); topology devices report
        # platform 'tpu', so the helper applies exactly as in production
        options = tr._epoch_compiler_options()
        record(
            "chunked_epoch" + ("_sharded_data" if args.shard_data else ""),
            lowered.compile(compiler_options=options),
            options,
        )

    js = json.dumps(results)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
