from .layers import (
    ConvLayer,
    ConvEquivFusionLayer,
    ConvEquivFusionDirectedLayer,
    ConvPreMultFusionLayer,
)
from .fields import (
    PermEquivGraphVectorField,
    PermEquivDirGraphVectorField,
    GraphVectorField,
    GNODEVectorField,
    GNODEFloorVectorField,
    PreMultFusionGraphVectorField,
    MLPVectorField,
    ConstVectorField,
)
from .st import STGraphVectorField
from .wrappers import (
    CDEWrapperVectorField,
    STCDEWrapperVectorField,
    PGTSTCDEWrapperVectorField,
)
