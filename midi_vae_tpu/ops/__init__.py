from . import fused_gru
