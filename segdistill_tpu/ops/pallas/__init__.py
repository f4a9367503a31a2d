from .group_kl import (fused_group_kl, fused_group_kl_shuffled,
                       group_kl_reference, can_use_fused)
from .seg_ce import fused_seg_ce, can_use_fused_ce
from .pixel_kl import fused_pixel_kl, can_use_fused_pixel
from .resize_sum import fused_resize_sum, can_use_fused_resize_sum
from .sra_attn import (fused_sra_attention, can_use_fused_attn,
                       sra_attention_train)

__all__ = ['fused_group_kl', 'fused_group_kl_shuffled',
           'group_kl_reference', 'can_use_fused',
           'fused_seg_ce', 'can_use_fused_ce', 'fused_pixel_kl',
           'can_use_fused_pixel', 'fused_resize_sum',
           'can_use_fused_resize_sum', 'fused_sra_attention',
           'can_use_fused_attn', 'sra_attention_train']
