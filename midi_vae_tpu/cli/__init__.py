"""Command-line drivers (the reference's script layer, with arguments).

Each module exposes ``main(argv) -> int`` and is reachable three ways:
the repo-root shims (``python train.py ...``), ``python -m
midi_vae_tpu.cli.train``, and the installed console scripts
(``midi-vae-train`` etc., see pyproject.toml [project.scripts]).
"""
