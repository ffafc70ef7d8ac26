from . import vector_fields
from . import neural_nets
from .continuous import GraphNeuralCDE, GraphNeuralODE
from .tgb import TGBGraphNeuralCDE, TGBGraphNeuralODE, TGBSTGraphNeuralCDE
from .pgt import PGTGraphNeuralCDE, PGTGraphNeuralODE, PGTSTGraphNeuralCDE
