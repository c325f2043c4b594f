"""Inert keras.objectives (vae_definition.py:1 imports the module only)."""
