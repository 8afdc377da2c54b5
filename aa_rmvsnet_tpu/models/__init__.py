"""Network modules: feature extraction, adaptive aggregation, recurrent
regularization, the core MVS network, the evidential head, losses, and the
torch-checkpoint converter."""

from .blocks import (
    ConvGNReLU,
    ResnetBlockGN,
    DeconvGNReLU,
    ConvLSTMCell,
    DeformConv,
    DeformConvGNReLU,
)
from .feature import FeatNet, IntraViewAA
from .aggregation import InterViewAA
from .regularizer import UNetConvLSTM, init_states
from .network import (
    AARMVSNetCore,
    SweepConfig,
    init_params,
    extract_features,
    sweep,
    forward,
    probability_volume,
    pick_depth_block,
)
from .convert import convert_state_dict, load_torch_checkpoint, count_params
