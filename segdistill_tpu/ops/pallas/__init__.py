from .group_kl import fused_group_kl, group_kl_reference, can_use_fused

__all__ = ['fused_group_kl', 'group_kl_reference', 'can_use_fused']
