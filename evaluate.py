#!/usr/bin/env python
"""Repo-root shim: the CLI lives at midi_vae_tpu.cli.evaluate (also installed
as the midi-vae-evaluate console script)."""

import sys

from midi_vae_tpu.cli.evaluate import main

if __name__ == "__main__":
    sys.exit(main())
