"""Golden checkpoint fixture for the converter chain (VERDICT r3 #6).

No published checkpoint ships in this image, so the fixture freezes the
next best thing: a deterministic, numpy-seeded state dict in the exact
mmseg SegFormer-B0 checkpoint key layout (keys/shapes enumerated from the
torch twin, values independent of torch RNG), plus COMMITTED golden
activations/logits computed ONCE by the torch twin
(``tests/golden/mit_b0_golden.npz``, created by running this file).

The round-trip test (``test_convert.py::test_golden_fixture_roundtrip``)
rebuilds the state dict, pushes it through the production converter
(``convert.load_pth_into_variables``) and asserts the flax model
reproduces the committed outputs — so converter/model regressions are
caught against a FIXED target rather than a same-session torch run,
closing the random-init-only gap (ref converters this guards:
tools/mit_converter.py:7, mmcv_custom/checkpoint.py:281-350).

Regenerate (only when the layout legitimately changes):
    cd /root/repo && PYTHONPATH=tests python tests/golden_fixture.py
"""

import os.path as osp

import numpy as np

NUM_CLASSES = 150
EMBED_DIM = 256
SEED = 20260819
GOLDEN_PATH = osp.join(osp.dirname(osp.abspath(__file__)), 'golden',
                       'mit_b0_golden.npz')


def build_torch_twin():
    from torch_ref.heads import EncoderDecoder, SegFormerHead
    from torch_ref.mit import mit_b0
    head = SegFormerHead([32, 64, 160, 256], EMBED_DIM, NUM_CLASSES)
    return EncoderDecoder(mit_b0(), head)


def golden_state_dict():
    """Deterministic numpy values for every leaf of the B0 twin's state
    dict. Norm scales sit near 1 and running vars are positive so the
    24-block forward stays well-conditioned."""
    import torch
    model = build_torch_twin()
    rs = np.random.RandomState(SEED)
    sd = {}
    for key, tensor in model.state_dict().items():
        shape = tuple(tensor.shape)
        if not tensor.dtype.is_floating_point:
            sd[key] = np.zeros(shape, np.int64)
            continue
        r = rs.randn(*shape).astype(np.float32)
        if key.endswith('running_var'):
            arr = np.abs(r) * 0.05 + 0.9
        elif key.endswith('running_mean'):
            arr = r * 0.05
        elif len(shape) == 1 and key.endswith('weight'):
            arr = 1.0 + r * 0.05  # BN/LN scale
        else:
            arr = r * 0.05
        sd[key] = arr
    return sd


def golden_input():
    return np.random.RandomState(SEED + 1).randn(1, 3, 64, 64).astype(
        np.float32)


def main():
    import torch
    model = build_torch_twin()
    sd = golden_state_dict()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=True)
    model.eval()
    x = torch.from_numpy(golden_input())
    with torch.no_grad():
        stages = model.backbone(x)
        logits = model.decode_head(stages)
    out = {'input': golden_input(),
           'logits': logits.numpy()}
    for i, s in enumerate(stages):
        out[f'stage{i}'] = s.numpy()
    import os
    os.makedirs(osp.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **out)
    print('wrote', GOLDEN_PATH,
          {k: v.shape for k, v in out.items()})


if __name__ == '__main__':
    main()
