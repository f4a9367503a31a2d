from .base import BaseSegmentor, parse_losses, flatten_feats
from .encoder_decoder import EncoderDecoder, EncoderDecoderNet
from .cascade_encoder_decoder import CascadeEncoderDecoder
from .sd_module import SDModule, SDModuleMT

__all__ = ['BaseSegmentor', 'parse_losses', 'flatten_feats',
           'EncoderDecoder', 'EncoderDecoderNet', 'CascadeEncoderDecoder',
           'SDModule', 'SDModuleMT']
