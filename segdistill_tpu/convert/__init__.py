from .torch_loader import (load_pth_into_variables, translate_state_dict,
                           load_state_dict_numpy)

__all__ = ['load_pth_into_variables', 'translate_state_dict',
           'load_state_dict_numpy']
