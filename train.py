#!/usr/bin/env python
"""Repo-root shim: the CLI lives at midi_vae_tpu.cli.train (also installed
as the midi-vae-train console script)."""

import sys

from midi_vae_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
