#!/usr/bin/env python
"""Serving export: model -> serialized StableHLO artifact.

TPU-native replacement for the reference's ``tools/pytorch2onnx.py``
(:19-146): instead of ONNX, the jitted inference function (weights baked
in) is exported with ``jax.export`` — a stable, versioned StableHLO
serialization loadable from any JAX process (``jax.export.deserialize``)
or compilable by any StableHLO consumer (IREE, XLA AOT, ...).

Exports ``argmax(encode_decode(img))`` (the deployment surface) or raw
logits with ``--logits``. For SDModule configs the student alone is
exported, matching the reference's inference delegation
(SD_structure.py:146-223).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='Export model to StableHLO')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None,
                        help='orbax work dir or .pth (optional)')
    parser.add_argument('--output', default='model.stablehlo')
    parser.add_argument('--shape', type=int, nargs=2, default=[512, 512],
                        metavar=('H', 'W'))
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--logits', action='store_true',
                        help='export fp32 logits instead of the argmax map')
    parser.add_argument('--platforms', default=None,
                        help='comma list, e.g. "tpu,cpu" (default: current '
                             'backend)')
    parser.add_argument('--mlir', default=None,
                        help='also dump human-readable StableHLO text here')
    return parser.parse_args()


def export_model(model, variables, shape, logits=False, platforms=None):
    """-> jax.export.Exported for fn(img NHWC) with weights baked in."""
    import jax
    import jax.numpy as jnp
    from jax import export

    target = model.student if hasattr(model, 'student') else model

    def fn(img):
        out = target.encode_decode(variables, img)
        if logits:
            return out
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    kwargs = {}
    if platforms:
        kwargs['platforms'] = platforms
    return export.export(jax.jit(fn), **kwargs)(spec)


def main():
    args = parse_args()
    from segdistill_tpu import Config
    from segdistill_tpu.apis import init_segmentor
    from segdistill_tpu.utils import get_root_logger

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    model, variables = init_segmentor(cfg, args.checkpoint,
                                      input_shape=(1, 64, 64, 3))
    if hasattr(model, 'student'):
        # init_segmentor already returns student variables for SDModule
        pass
    shape = (args.batch, args.shape[0], args.shape[1], 3)
    platforms = args.platforms.split(',') if args.platforms else None
    exp = export_model(model, variables, shape, logits=args.logits,
                       platforms=platforms)
    data = exp.serialize()
    with open(args.output, 'wb') as f:
        f.write(data)
    logger.info(f'exported {shape} -> {args.output} '
                f'({len(data) / 1e6:.1f} MB, platforms={exp.platforms})')
    if args.mlir:
        with open(args.mlir, 'w') as f:
            f.write(exp.mlir_module())
        logger.info(f'StableHLO text -> {args.mlir}')


if __name__ == '__main__':
    main()
