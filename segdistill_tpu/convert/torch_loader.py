"""torch ``.pth`` -> flax variables converter.

Plays the role of the reference's checkpoint loaders + converters
(``mmcv_custom/checkpoint.py``, ``tools/mit_converter.py``,
``tools/convert_model.py``): loads the published teacher/student/backbone
zoo into this framework's NHWC flax parameter trees.

Layout conversions: conv (O,I,kh,kw) -> (kh,kw,I,O); linear (O,I) -> (I,O);
norm weight/bias -> scale/bias (+ running stats into 'batch_stats'). Key
translation handles both torch module-list names ('block1.0') and this
framework's flax names ('block1_0'), plus the known structural renames
(SegFormer MLP '.proj', PPM sequential index, deep-stem sequential, Swin
names). The Swin relative_position_bias_table is bicubic-interpolated on
window-size mismatch (ref mmcv_custom/checkpoint.py:320-347).
"""

import re

import numpy as np

import flax

# (pattern, replacement) applied to the dotted torch key, in order
_KEY_RULES = [
    (r'^module\.', ''),
    (r'\bblock(\d+)\.(\d+)\.', r'block\1_\2.'),
    (r'\blayer(\d+)\.(\d+)\.', r'layer\1_\2.'),
    (r'\blayers\.(\d+)\.blocks\.(\d+)\.', r'layers_\1_blocks_\2.'),
    (r'\blayers\.(\d+)\.downsample\.', r'layers_\1_downsample.'),
    (r'\bpatch_embed\.proj\.', 'patch_embed_proj.'),
    (r'\bpatch_embed\.norm\.', 'patch_embed_norm.'),
    (r'\blinear_c(\d)\.proj\.', r'linear_c\1.'),
    (r'\bpsp_modules\.(\d+)\.1\.', r'psp_modules.pool_\1.'),
    (r'\blateral_convs\.(\d+)\.', r'lateral_convs_\1.'),
    (r'\bfpn_convs\.(\d+)\.', r'fpn_convs_\1.'),
    (r'\bconvs\.(\d+)\.', r'convs_\1.'),
    (r'\baspp_modules\.(\d+)\.', r'aspp_\1.'),
    # UNet (ref unet.py:333-373 + up_conv_block.py): the encoder stage
    # Sequential may start with a param-free MaxPool, so the block index
    # is dropped; InterpConv's conv sits at interp_upsample slot 1.
    # These run AFTER the generic convs.N -> convs_N rule above, so they
    # match the rewritten form.
    (r'\bencoder\.(\d)\.(\d)\.convs_(\d)\.', r'encoder_\1.convs_\3.'),
    (r'\bdecoder\.(\d)\.conv_block\.convs_(\d)\.',
     r'decoder_\1.convs_\2.'),
    (r'\bdecoder\.(\d)\.upsample\.interp_upsample\.1\.', r'up_conv_\1.'),
    (r'\bdecoder\.(\d)\.upsample\.(?=(?:conv|bn)\.)', r'up_conv_\1.'),
    # FPNHead scale heads (ref fpn_head.py:30-52): Sequentials interleave
    # param-free Upsamples, so conv slots are 0,2,4 -> _0,_1,_2
    (r'\bscale_heads\.(\d)\.0\.', r'scale_heads_\1_0.'),
    (r'\bscale_heads\.(\d)\.2\.', r'scale_heads_\1_1.'),
    (r'\bscale_heads\.(\d)\.4\.', r'scale_heads_\1_2.'),
    # ANN head (ref ann_head.py:103-181): per-query-scale attention
    # stages; this framework nests the SelfAttentionBlock under 'attn'.
    # Anchored to the AFNB/APNB parents so backbones with a 'stages.N.'
    # layout (mmcls Swin/ConvNeXt-style checkpoints) are untouched.
    (r'\b(fusion|context)\.stages\.(\d+)\.', r'\1.stages_\2.attn.'),
    # PSA head (ref psa_head.py:64-96): attention/attention_p Sequentials
    # of ConvModule + bare mask Conv2d -> attention[_p]_{0,1} children
    (r'\battention(_p)?\.(\d)\.', r'attention\1_\2.'),
    # APC / DM heads: ModuleList indices -> flat child names
    (r'\bacm_modules\.(\d+)\.', r'acm_\1.'),
    (r'\bdcm_modules\.(\d+)\.', r'dcm_\1.'),
    # Enc head (ref enc_head.py:11-59): Encoding + BN1d + fc Sequentials
    (r'\benc_module\.encoding\.0\.', 'enc_module.encoding.'),
    (r'\benc_module\.encoding\.1\.', 'enc_module.encoding_bn.'),
    (r'\benc_module\.fc\.0\.', 'enc_module.fc.'),
    # EMA head: the (1, C, K) bases buffer (ref ema_head.py:38-42)
    (r'\bema_module\.bases$', 'ema_module_bases'),
    # mmcv ContextBlock (GCHead): Sequential(conv, LayerNorm, ReLU, conv)
    (r'\bchannel_add_conv\.(\d)\.', r'channel_add_conv_\1.'),
    (r'\bchannel_mul_conv\.(\d)\.', r'channel_mul_conv_\1.'),
    # cascade segmentors (ref cascade_encoder_decoder.py): indexed heads
    (r'\bdecode_head\.(\d)\.', r'decode_heads_\1.'),
    # OCR head (ref ocr_head.py:39-127): the ObjectAttentionBlock's inner
    # bottleneck lands on 'conv_bn'; the block itself on
    # 'object_attention'. Order matters (longest first).
    (r'\bobject_context_block\.bottleneck\.', 'conv_bn.'),
    (r'\bobject_context_block\.', 'object_attention.'),
    # SelfAttentionBlock projections (ref self_attention_block.py:
    # 99-129): bare convs when use_conv_module=False, ConvModule(s)
    # otherwise, Sequential only when num_convs > 1. All land on this
    # framework's {name}_project_{i}[.conv] children.
    (r'\b(key|query|value|out)_project\.(\d)\.(?=(?:conv|bn)\.)',
     r'\1_project_\2.'),
    (r'\b(key|query|value|out)_project\.(\d)\.(?=\w+$)',
     r'\1_project_\2.conv.'),
    (r'\b(key|query|value|out)_project\.(?=(?:conv|bn)\.)',
     r'\1_project_0.'),
    (r'\b(key|query|value|out)_project\.(?=\w+$)', r'\1_project_0.conv.'),
    # DeepLabV3+ head (ref sep_aspp_head.py:62-77): Sequential slots
    (r'\bsep_bottleneck\.0\.', 'sep_conv1.'),
    (r'\bsep_bottleneck\.1\.', 'sep_conv2.'),
    # LRASPP head (ref mmseg/models/decode_heads/lraspp_head.py:33-66):
    # named Sequential children + the image_pool Sequential slot.
    (r'\bconvs\.conv(\d)\.', r'convs_\1.'),
    (r'\bconv_ups\.conv_up(\d)\.', r'conv_ups_\1.'),
    (r'\bimage_pool\.1\.', 'image_pool_conv.'),
    # HRNet (ref mmseg/models/backbones/hrnet.py:290-543). Sequential
    # index -> ConvModule child; the 3-index transition chain / 5-index
    # fuse rules must precede their shorter 2-/4-index variants. The
    # (?=\w+$) lookahead anchors the {0,1} Sequential slot to the leaf
    # so conv (.0.) and bn (.1.) slots are not confused with branch
    # indices.
    (r'\btransition(\d)\.(\d+)\.(\d+)\.0\.(?=\w+$)',
     r'transition\1_\2_\3.conv.'),
    (r'\btransition(\d)\.(\d+)\.(\d+)\.1\.(?=\w+$)',
     r'transition\1_\2_\3.bn.'),
    (r'\btransition(\d)\.(\d+)\.0\.(?=\w+$)', r'transition\1_\2.conv.'),
    (r'\btransition(\d)\.(\d+)\.1\.(?=\w+$)', r'transition\1_\2.bn.'),
    (r'\bstage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.',
     r'stage\1_m\2_b\3.block_\4.'),
    (r'\bstage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.0\.(?=\w+$)',
     r'stage\1_m\2_fuse.fuse_\3_\4_\5.conv.'),
    (r'\bstage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.1\.(?=\w+$)',
     r'stage\1_m\2_fuse.fuse_\3_\4_\5.bn.'),
    (r'\bstage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0\.(?=\w+$)',
     r'stage\1_m\2_fuse.fuse_\3_\4.conv.'),
    (r'\bstage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.1\.(?=\w+$)',
     r'stage\1_m\2_fuse.fuse_\3_\4.bn.'),
    # CGNet (ref mmseg/models/backbones/cgnet.py:247-334): ModuleList
    # stem of ConvModules (distinguished from ResNet's bare-layer deep
    # stem below by the conv/bn/activate child), norm_prelu Sequentials
    # (bn at .0, PReLU at .1), level blocks, f_glo's fc Sequential.
    (r'\bstem\.(\d)\.(?=(?:conv|bn|activate)\.)', r'stem_\1.'),
    (r'\bnorm_prelu_(\d)\.0\.', r'norm_prelu_\1_bn.'),
    (r'\bnorm_prelu_(\d)\.1\.', r'norm_prelu_\1_act.'),
    (r'\blevel(\d)\.(\d+)\.', r'level\1_\2.'),
    (r'\bf_glo\.fc\.0\.', 'f_glo.fc1.'),
    (r'\bf_glo\.fc\.2\.', 'f_glo.fc2.'),
    (r'\bstem\.0\.', 'stem_conv1.'), (r'\bstem\.1\.', 'stem_bn1.'),
    (r'\bstem\.3\.', 'stem_conv2.'), (r'\bstem\.4\.', 'stem_bn2.'),
    (r'\bstem\.6\.', 'stem_conv3.'), (r'\bstem\.7\.', 'stem_bn3.'),
    # plain residual downsample: Sequential(conv, bn). The V1d/ResNeSt
    # avg_down layout Sequential(pool, conv, bn) shifts conv to .1 and
    # bn to .2 (ref models/utils/res_layer.py:44-62); .1-as-conv is
    # recovered shape-wise via the _BASE_ALTERNATES fallback below.
    (r'\bdownsample\.0\.', 'downsample.conv.'),
    (r'\bdownsample\.1\.', 'downsample.bn.'),
    (r'\bdownsample\.2\.', 'downsample.bn.'),
    # Fast-SCNN module names (ref mmseg/models/backbones/fast_scnn.py:
    # 335-360) -> this framework's flat child names; bottleneckN.M then
    # falls through to the InvertedResidual Sequential rules below.
    (r'\blearning_to_downsample\.conv\.', 'ld_conv.'),
    (r'\blearning_to_downsample\.dsconv(\d)\.', r'ld_dsconv\1.'),
    (r'\bglobal_feature_extractor\.bottleneck(\d)\.(\d+)\.',
     r'bottleneck\1_\2.'),
    (r'\bglobal_feature_extractor\.ppm\.(\d+)\.1\.', r'ppm.pool_\1.'),
    (r'\bglobal_feature_extractor\.out\.', 'gfe_out.'),
    (r'\bfeature_fusion\.dwconv\.', 'ffm_dwconv.'),
    (r'\bfeature_fusion\.conv_lower_res\.', 'ffm_conv_lower.'),
    (r'\bfeature_fusion\.conv_higher_res\.', 'ffm_conv_higher.'),
    # MobileNetV2 / Fast-SCNN InvertedResidual nn.Sequential (ref
    # mmseg/models/utils/inverted_residual.py:49-79) -> this framework's
    # named children. MNv2's layer1 is the only expand_ratio=1 stage
    # (arch row [1, 16, 1]), so its 2-module Sequential starts at
    # depthwise; all others have the 1x1 expand first. Must run after
    # the layerN.M -> layerN_M / bottleneckN.M -> bottleneckN_M rules.
    (r'\b(layer1_\d+\.)conv\.0\.', r'\1depthwise_conv.'),
    (r'\b(layer1_\d+\.)conv\.1\.', r'\1linear_conv.'),
    (r'\b((?:layer\d+|bottleneck\d)_\d+\.)conv\.0\.', r'\1expand_conv.'),
    (r'\b((?:layer\d+|bottleneck\d)_\d+\.)conv\.1\.', r'\1depthwise_conv.'),
    (r'\b((?:layer\d+|bottleneck\d)_\d+\.)conv\.2\.', r'\1linear_conv.'),
]

# structural alternates tried when the direct path is absent
_BASE_ALTERNATES = [
    (r'^decode_head\.bottleneck\.', 'decode_head.psp_bottleneck.'),
    # avg_down downsample: torch 'downsample.1.weight' is the CONV (4D)
    # there, not the bn scale — the bn candidates fail on shape and this
    # alternate reroutes to the conv kernel
    (r'^(.*\bdownsample)\.bn\.', r'\1.conv.'),
]


def _translate_base(key):
    for pat, repl in _KEY_RULES:
        key = re.sub(pat, repl, key)
    return key


def _candidates(base_comps, leaf, ndim):
    """Possible (collection, flax path) for a torch leaf name."""
    out = []
    if leaf == 'weight':
        if ndim >= 2:
            out.append(('params', base_comps + ('kernel',)))
        out.append(('params', base_comps + ('scale',)))
        for n in ('bn', 'ln', 'gn'):
            out.append(('params', base_comps + (n, 'scale')))
        if ndim == 1:
            # torch nn.PReLU stores its per-channel slope as '.weight'
            out.append(('params', base_comps + ('weight',)))
    elif leaf == 'bias':
        out.append(('params', base_comps + ('bias',)))
        for n in ('bn', 'ln', 'gn'):
            out.append(('params', base_comps + (n, 'bias')))
    elif leaf == 'running_mean':
        out.append(('batch_stats', base_comps + ('mean',)))
        out.append(('batch_stats', base_comps + ('bn', 'mean')))
    elif leaf == 'running_var':
        out.append(('batch_stats', base_comps + ('var',)))
        out.append(('batch_stats', base_comps + ('bn', 'var')))
    else:
        # direct parameter (relative_position_bias_table, pos embeds, ...)
        out.append(('params', base_comps + (leaf,)))
        # non-trainable buffers kept as model state (EMA bases, ...)
        out.append(('batch_stats', base_comps + (leaf,)))
    return out


def _convert_tensor(torch_arr, target_shape, is_weight=False):
    """Layout-convert a torch tensor to the flax target shape.

    2D '.weight' leaves always transpose (torch Linear is (O, I), flax
    Dense is (I, O)) — including square matrices, where a bare shape match
    would silently skip the transpose.
    """
    arr = np.asarray(torch_arr)
    if arr.ndim == 2 and is_weight and arr.T.shape == tuple(target_shape):
        return arr.T  # linear (O,I) -> (I,O)
    if arr.ndim == 4 and is_weight and arr.transpose(2, 3, 1, 0).shape == \
            tuple(target_shape):
        return arr.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
    if arr.shape == tuple(target_shape):
        return arr
    if not is_weight and arr.ndim > 1 \
            and np.squeeze(arr).shape == tuple(target_shape):
        # e.g. mmcv ContextBlock's LayerNorm([planes, 1, 1]) stores
        # (planes, 1, 1) scale/bias for this framework's (planes,)
        return np.squeeze(arr)
    return None


def _interp_bias_table(arr, target_shape):
    """Bicubic resize of the Swin relative position bias table
    (ref mmcv_custom/checkpoint.py:320-347)."""
    import cv2
    L1, nH = arr.shape
    L2 = target_shape[0]
    S1, S2 = int(np.sqrt(L1)), int(np.sqrt(L2))
    table = arr.T.reshape(nH, S1, S1)
    resized = np.stack([
        cv2.resize(table[i], (S2, S2), interpolation=cv2.INTER_CUBIC)
        for i in range(nH)])
    return resized.reshape(nH, L2).T


def load_state_dict_numpy(path):
    """Load a torch checkpoint as {key: np.ndarray} (cpu torch)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    elif isinstance(ckpt, dict) and 'model' in ckpt \
            and isinstance(ckpt['model'], dict):
        ckpt = ckpt['model']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in ckpt.items()}


def translate_state_dict(state_dict, variables, backbone_only=False,
                         logger=None):
    """-> (new flat variables dict, matched keys, missing, unexpected)."""
    flat = {}
    for col, tree in variables.items():
        for k, v in flax.traverse_util.flatten_dict(tree).items():
            flat[(col,) + k] = v
    new_flat = dict(flat)

    # official backbone-only checkpoints lack the 'backbone.' prefix
    if backbone_only and not any(k.startswith('backbone.')
                                 for k in state_dict):
        state_dict = {'backbone.' + k: v for k, v in state_dict.items()}

    matched, unexpected = set(), []
    for key, arr in state_dict.items():
        # non-weight buffers: BN counters and Swin's precomputed index /
        # mask buffers (recomputed statically on the flax side)
        if key.endswith(('num_batches_tracked', 'relative_position_index',
                         'attn_mask')):
            continue
        base = _translate_base(key)
        bases = [base] + [re.sub(p, r, base) for p, r in _BASE_ALTERNATES
                          if re.match(p, base)]
        comps_leaf = [(tuple(b.split('.')[:-1]), b.split('.')[-1])
                      for b in bases]
        placed = False
        for comps, leaf in comps_leaf:
            for col, path in _candidates(comps, leaf, np.asarray(arr).ndim):
                full = (col,) + path
                if full in flat:
                    target_shape = flat[full].shape
                    conv = _convert_tensor(arr, target_shape,
                                           is_weight=(leaf == 'weight'
                                                      and path[-1]
                                                      == 'kernel'))
                    if conv is None and path[-1].endswith(
                            'relative_position_bias_table'):
                        conv = _interp_bias_table(np.asarray(arr),
                                                  target_shape)
                    if conv is None:
                        continue
                    new_flat[full] = conv.astype(np.asarray(
                        flat[full]).dtype if hasattr(flat[full], 'dtype')
                        else np.float32)
                    matched.add(full)
                    placed = True
                    break
            if placed:
                break
        if not placed:
            unexpected.append(key)

    # only weight-bearing collections count as missing; sown intermediates
    # ('feats' taps) are per-apply outputs, not loadable state
    missing = [k for k in flat if k not in matched
               and k[0] in ('params', 'batch_stats')]
    out = {}
    for col in variables:
        col_flat = {k[1:]: v for k, v in new_flat.items() if k[0] == col}
        out[col] = flax.traverse_util.unflatten_dict(col_flat)
    return out, matched, missing, unexpected


def load_pth_into_variables(variables, path, model=None, strict=False,
                            backbone_only=False):
    """Load a torch checkpoint into flax ``variables``
    (ref SD_structure.py:29-37 load semantics)."""
    from ..utils import get_root_logger
    logger = get_root_logger()
    state_dict = load_state_dict_numpy(path)
    new_vars, matched, missing, unexpected = translate_state_dict(
        state_dict, variables, backbone_only=backbone_only, logger=logger)
    interesting_missing = [k for k in missing
                           if 'dropout' not in '.'.join(map(str, k))]
    logger.info(f'loaded {path}: {len(matched)} tensors matched, '
                f'{len(interesting_missing)} missing, '
                f'{len(unexpected)} unexpected')
    if unexpected:
        logger.info(f'  unexpected (first 10): {unexpected[:10]}')
    if interesting_missing:
        logger.info('  missing (first 10): '
                    f'{[".".join(map(str, k)) for k in interesting_missing[:10]]}')
    if strict and (interesting_missing or unexpected):
        raise RuntimeError(
            f'strict load failed for {path}: missing='
            f'{[".".join(map(str, k)) for k in interesting_missing[:20]]} '
            f'unexpected={unexpected[:20]}')
    return new_vars
