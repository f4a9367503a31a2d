from .decode_head import BaseDecodeHead
from .segformer_head import SegFormerHead
from .fcn_head import FCNHead
from .psp_head import PSPHead
from .uper_head import UPerHead
from .aspp_head import ASPPHead
from .sep_aspp_head import DepthwiseSeparableASPPHead
from .fpn_head import FPNHead
from .nl_head import NLHead, GCHead, DNLHead
from .ocr_head import OCRHead, BaseCascadeDecodeHead
from .sep_fcn_head import DepthwiseSeparableFCNHead
from .lraspp_head import LRASPPHead
from .ann_head import ANNHead
from .apc_head import APCHead, DMHead
from .da_head import DAHead, CCHead, EMAHead, EncHead
from .psa_head import PSAHead
from .point_head import PointHead

__all__ = [
    'BaseDecodeHead', 'SegFormerHead', 'FCNHead', 'PSPHead', 'UPerHead',
    'ASPPHead', 'DepthwiseSeparableASPPHead', 'FPNHead', 'NLHead', 'GCHead',
    'DNLHead', 'OCRHead', 'BaseCascadeDecodeHead',
    'DepthwiseSeparableFCNHead', 'LRASPPHead', 'ANNHead', 'APCHead',
    'DMHead', 'DAHead', 'CCHead', 'EMAHead', 'EncHead', 'PSAHead',
    'PointHead'
]
