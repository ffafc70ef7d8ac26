from .final_tanh import FinalTanhF
from .idx_encoder import IdxEncoder
