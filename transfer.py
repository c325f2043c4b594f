#!/usr/bin/env python
"""Repo-root shim: the CLI lives at midi_vae_tpu.cli.transfer (also installed
as the midi-vae-transfer console script)."""

import sys

from midi_vae_tpu.cli.transfer import main

if __name__ == "__main__":
    sys.exit(main())
