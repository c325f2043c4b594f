#!/usr/bin/env python
"""Repo-root shim: the CLI lives at midi_vae_tpu.cli.generate (also installed
as the midi-vae-generate console script)."""

import sys

from midi_vae_tpu.cli.generate import main

if __name__ == "__main__":
    sys.exit(main())
