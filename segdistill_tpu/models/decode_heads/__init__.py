from .decode_head import BaseDecodeHead
from .segformer_head import SegFormerHead
from .fcn_head import FCNHead
from .psp_head import PSPHead
from .uper_head import UPerHead
from .aspp_head import ASPPHead
from .sep_aspp_head import DepthwiseSeparableASPPHead

__all__ = [
    'BaseDecodeHead', 'SegFormerHead', 'FCNHead', 'PSPHead', 'UPerHead',
    'ASPPHead', 'DepthwiseSeparableASPPHead'
]
