"""flax.linen model zoo (the reference's `models/iscnet/modules` layer)."""

from .backbone import Pointnet2Backbone
from .common import BatchNorm, Dense, MLPHead, SharedMLP
from .iscnet import ISCNet, select_completion_proposals
from .layers import (
    CBatchNorm,
    CResnetBlockConv1d,
    DecoderCBatchNorm,
    EncoderLatent,
    ResnetBlockFC,
    ResnetPointnet,
    SelfAttention,
)
from .losses import (
    boxnet_detection_loss,
    chamfer_loss,
    detection_loss,
    onet_loss,
)
from .occnet import ONet, make_3d_grid
from .pointnet2 import (
    FeaturePropagation,
    GroupSTN3d,
    SetAbstraction,
    SetAbstractionMSG,
    STNGroup,
)
from .pointseg import PointNetEncoder, PointSeg, pointseg_loss
from .proposal import ProposalModule, decode_scores
from .skip_propagation import SkipPropagation
from .voting import VotingModule

__all__ = [
    "BatchNorm", "CBatchNorm", "CResnetBlockConv1d", "DecoderCBatchNorm",
    "Dense", "EncoderLatent", "FeaturePropagation", "GroupSTN3d", "ISCNet",
    "MLPHead", "ONet", "PointNetEncoder", "PointSeg", "Pointnet2Backbone",
    "ProposalModule", "ResnetBlockFC", "ResnetPointnet", "SelfAttention", "SetAbstraction", "SetAbstractionMSG",
    "SharedMLP", "SkipPropagation", "STNGroup", "VotingModule",
    "boxnet_detection_loss", "chamfer_loss", "decode_scores", "detection_loss", "make_3d_grid",
    "onet_loss", "pointseg_loss", "select_completion_proposals",
]
