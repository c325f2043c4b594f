"""Empty mido stand-in: /root/reference/midi_functions.py:9 imports mido but
never calls into it; this module lets that import succeed."""
