#!/usr/bin/env python
"""Repo-root shim: the CLI lives at midi_vae_tpu.cli.classify (also installed
as the midi-vae-classify console script)."""

import sys

from midi_vae_tpu.cli.classify import main

if __name__ == "__main__":
    sys.exit(main())
