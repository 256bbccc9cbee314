from .cells import FixedCell
from .feature_net import FeatureNet
from .genotypes import (
    BEST_SCENEFLOW,
    PRIMITIVES,
    Architecture,
    load_architecture,
    network_layer_to_space,
)
from .leastereo import LEAStereo, LEAStereoConfig, best_sceneflow_model
from .matching_net import MatchingNet

__all__ = [
    "FixedCell",
    "FeatureNet",
    "MatchingNet",
    "LEAStereo",
    "LEAStereoConfig",
    "best_sceneflow_model",
    "BEST_SCENEFLOW",
    "PRIMITIVES",
    "Architecture",
    "load_architecture",
    "network_layer_to_space",
]
