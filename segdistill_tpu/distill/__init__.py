from .losses import (KLDLoss, PDLoss, CDLoss, CGDLoss, CGDLossWS, ATLoss,
                     IFVDLoss, DISTILL_LOSSES)
from .engine import DistillationLoss, needed_layers, convert_tap

__all__ = ['KLDLoss', 'PDLoss', 'CDLoss', 'CGDLoss', 'CGDLossWS', 'ATLoss',
           'IFVDLoss', 'DISTILL_LOSSES', 'DistillationLoss', 'needed_layers',
           'convert_tap']
