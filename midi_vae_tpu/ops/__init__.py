from . import fused_gru
from . import fused_decoder
from . import fused_lstm
