from .dataset_configs import ODEDataSetCfg
from .vector_field_configs import VectorFieldCfg
from .neural_nets_configs import NeuralNetsCfg
from .optimiser_configs import (
    ConstantScheduleCfg,
    WarmupCosineDecayScheduleCfg,
    OptimiserCfg,
)
from .loss_configs import MSELossCfg, L1LossCfg
from .wandb_configs import WandBConfig
from .model_configs import (
    GraphNeuralCDECfg,
    GraphNeuralODECfg,
    TGBGraphNeuralCDECfg,
    TGBGraphNeuralODECfg,
    TGBSTGraphNeuralODECfg,
    PGTGraphNeuralCDECfg,
    PGTGraphNeuralODECfg,
    PGTSTGraphNeuralCDECfg,
    StidGCNCfg,
    ASTGCNCfg,
    DCRNNCfg,
)
