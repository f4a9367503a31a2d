"""Anchor the parity oracles to the ACTUAL reference source
(VERDICT r2, Missing #2 / Next #2).

Round-2 parity gated flax against hand-written torch replicas
(tests/torch_ref/) — careful, but a shared misreading of the reference
would pass silently. These tests import the reference's own files
verbatim through tests/ref_shims.py and assert:

* flax (through the production ``.pth`` converter) == reference source
  logits for the flagship MiT-b0 + SegFormerHead family
  (ref mix_transformer.py:221-442, segformer_head.py:37-98);
* the hand-written replica == reference source (so every other replica-
  based test inherits the anchoring);
* every jax distillation loss == the reference's verbatim
  ``mmseg/models/distillation/losses.py`` classes, including the
  -1e9 channel-pad path, warmup/earlydecay boundaries and AT/IFVD.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

import ref_shims

if not ref_shims.reference_available():  # pragma: no cover
    pytest.skip('reference checkout not present', allow_module_level=True)

REF = ref_shims.load_reference()

from test_torch_parity import _randomize  # noqa: E402
from segdistill_tpu.convert.torch_loader import (  # noqa: E402
    load_pth_into_variables)
from segdistill_tpu.models import build_segmentor  # noqa: E402

NORM = dict(type='SyncBN', requires_grad=True)


def _ref_head(in_channels, embed_dim=64, num_classes=19, dropout_ratio=0.1):
    head = REF.SegFormerHead(
        feature_strides=[4, 8, 16, 32], in_channels=in_channels,
        in_index=[0, 1, 2, 3], channels=128, dropout_ratio=dropout_ratio,
        num_classes=num_classes, norm_cfg=dict(NORM), align_corners=False,
        decoder_params=dict(embed_dim=embed_dim))
    return head


class RefSegformer(torch.nn.Module):
    """backbone+decode_head composite with the reference's module names
    (so state-dict keys and Extractor layer paths match the reference)."""

    def __init__(self, backbone, decode_head):
        super().__init__()
        self.backbone = backbone
        self.decode_head = decode_head

    def forward(self, x):
        return self.decode_head(self.backbone(x))


def _zero_stochastic(model):
    """p=0 for every Dropout/DropPath so train mode is deterministic
    (the flax side runs dropout_ratio=0 / drop_path_rate=0)."""
    for m in model.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
        if type(m).__name__ == 'DropPath':
            m.drop_prob = 0.0
    return model


def _build_ref_b0(num_classes=19, embed_dim=64, seed=21):
    model = RefSegformer(REF.mit_b0(), _ref_head([32, 64, 160, 256],
                                                 embed_dim, num_classes))
    _zero_stochastic(model)
    return _randomize(model, seed=seed)


def _flax_b0_cfg(num_classes=19, embed_dim=64):
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b0', gelu_approximate=False,
                      drop_path_rate=0.0),
        decode_head=dict(
            type='SegFormerHead', in_channels=[32, 64, 160, 256],
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=128, dropout_ratio=0.0, num_classes=num_classes,
            norm_cfg=NORM, align_corners=False,
            decoder_params=dict(embed_dim=embed_dim)),
        test_cfg=dict(mode='whole'))


@pytest.fixture(scope='module')
def anchored(tmp_path_factory):
    tmodel = _build_ref_b0().eval()
    fmodel = build_segmentor(_flax_b0_cfg())
    path = str(tmp_path_factory.mktemp('ref_anchor') / 'ref.pth')
    torch.save(tmodel.state_dict(), path)
    variables = fmodel.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = load_pth_into_variables(variables, path, strict=False)
    return tmodel, fmodel, variables


@pytest.mark.slow
class TestFlaxMatchesReferenceSource:
    """flax == the reference's own mix_transformer.py / segformer_head.py,
    through the production converter."""

    def test_backbone_stages(self, anchored):
        tmodel, fmodel, variables = anchored
        x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel.backbone(torch.from_numpy(x))
        f_outs = fmodel.net.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
            method=fmodel.net.extract_feat)
        for s, (t, f) in enumerate(zip(t_outs, f_outs)):
            np.testing.assert_allclose(
                np.asarray(f, np.float32).transpose(0, 3, 1, 2), t.numpy(),
                rtol=1e-4, atol=1e-5,
                err_msg=f'stage {s + 1} diverged from reference source')

    def test_full_logits(self, anchored):
        tmodel, fmodel, variables = anchored
        x = np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            t_logits = tmodel(torch.from_numpy(x)).numpy()
        outs = fmodel.net.apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=False, with_aux=False)
        f_logits = np.asarray(outs['decode'], np.float32).transpose(
            0, 3, 1, 2)
        np.testing.assert_allclose(f_logits, t_logits, rtol=1e-4, atol=1e-5)

    def test_converter_covers_every_reference_tensor(self, anchored):
        """Every tensor of the reference state dict must be consumed by
        the converter except the reference's own dead weight: the unused
        ``conv_seg`` that BaseDecodeHead always creates
        (ref decode_head.py:83) while SegFormerHead predicts through
        ``linear_pred`` (segformer_head.py:73)."""
        from segdistill_tpu.convert.torch_loader import (
            load_state_dict_numpy, translate_state_dict)
        tmodel, fmodel, variables = anchored
        import tempfile
        with tempfile.NamedTemporaryFile(suffix='.pth') as f:
            torch.save(tmodel.state_dict(), f.name)
            sd = load_state_dict_numpy(f.name)
        _, matched, missing, unexpected = translate_state_dict(sd, variables)
        allowed = {'decode_head.conv_seg.weight',
                   'decode_head.conv_seg.bias',
                   'decode_head.bn.num_batches_tracked',
                   'decode_head.linear_fuse.bn.num_batches_tracked'}
        stray = [k for k in unexpected
                 if not (k in allowed or k.endswith('num_batches_tracked'))]
        assert not stray, f'converter dropped reference tensors: {stray}'


@pytest.mark.slow
def test_replica_matches_reference_source():
    """tests/torch_ref (the oracle used by every other parity test) ==
    the reference source, on shared random weights."""
    from torch_ref.heads import SegFormerHead as RepHead
    from torch_ref.mit import mit_b0 as rep_mit_b0

    ref_model = _build_ref_b0(seed=33).eval()
    rep = RefSegformer(rep_mit_b0(),
                       RepHead([32, 64, 160, 256], 64, 19)).eval()
    missing, unexpected = rep.load_state_dict(ref_model.state_dict(),
                                              strict=False)
    # the replica deliberately omits the reference's dead conv_seg
    assert not missing, f'replica missing reference keys: {missing}'
    stray = [k for k in unexpected
             if 'conv_seg' not in k and 'num_batches_tracked' not in k]
    assert not stray, f'reference keys the replica does not load: {stray}'

    x = torch.from_numpy(
        np.random.RandomState(4).randn(2, 3, 64, 64).astype(np.float32))
    with torch.no_grad():
        ref_logits = ref_model(x)
        rep_logits = rep(x)
    np.testing.assert_allclose(rep_logits.numpy(), ref_logits.numpy(),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# distillation losses: jax vs the verbatim reference classes
# --------------------------------------------------------------------------
def _pair(shape, seed):
    rs = np.random.RandomState(seed)
    s = rs.randn(*shape).astype(np.float32)
    t = rs.randn(*shape).astype(np.float32)
    return s, t


def _gt(b, h, w, seed, num_classes=19):
    rs = np.random.RandomState(seed)
    return rs.randint(0, num_classes, (b, 1, h, w)).astype(np.int64)


@pytest.mark.parametrize('name,kwargs,shape,step', [
    ('PDLoss', {}, (2, 19, 16, 16), 1),
    ('CDLoss', {}, (2, 19, 16, 16), 1),
    ('CGDLoss', dict(group_size=10, alpha=3, tau=2), (2, 19, 16, 16), 7),
    ('CGDLoss', dict(group_size=5, alpha=2, tau=4), (2, 20, 16, 16), 7),
    ('CGDLoss', dict(group_size=7, alpha=1, tau=1), (2, 150, 8, 8), 3),
    ('ATLoss', {}, (2, 19, 16, 16), 1),
    ('IFVDLoss', {}, (2, 19, 16, 16), 1),
])
def test_loss_matches_reference_source(name, kwargs, shape, step):
    """Identical values from the jax loss and the reference's verbatim
    torch class (incl. the C % group_size != 0 -> -1e9 pad path)."""
    from segdistill_tpu.distill.losses import DISTILL_LOSSES
    s, t = _pair(shape, seed=hash((name, shape)) % 2 ** 31)
    gt = _gt(shape[0], 32, 32, seed=11)

    ref_loss = getattr(REF, name)(**kwargs)
    want = ref_loss(torch.from_numpy(s), torch.from_numpy(t),
                    torch.from_numpy(gt), step)
    got = DISTILL_LOSSES[name](**kwargs)(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(gt), step)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize('step', [1, 1000, 1999, 2000, 2001, 50000,
                                  109999, 110000, 110001, 115000, 119999,
                                  120000, 150000])
def test_cgdws_schedule_matches_reference_source(step):
    """CGDLossWS warmup/earlydecay at every boundary the reference's
    stateful warmup()/earlydecay() treats specially (losses.py:61-92).
    The reference mutates self.alpha in-place; a FRESH instance per step
    isolates the pure step->alpha map our jittable schedule replicates.
    Shuffle steps (step % 1000 == 0) draw the same no-op on both sides
    only when the permutation is identity, so the shuffle is disabled
    here and covered by test_shuffle_semantics below."""
    from segdistill_tpu.distill.losses import KLDLoss
    s, t = _pair((2, 19, 16, 16), seed=5)
    gt = _gt(2, 32, 32, seed=6)

    cfg = dict(alpha=3, tau=2,
               resize_config={'mode': 'bilinear', 'align_corners': False},
               transform_config={'loss_type': 'channel', 'group_size': 10},
               warmup_config={'mode': 'linear', 'warmup_iters': 2000},
               earlydecay_config={'mode': 'linear',
                                  'earlydecay_start': 110000,
                                  'earlydecay_end': 120000})
    want = REF.KLDLoss(**cfg)(torch.from_numpy(s), torch.from_numpy(t),
                              torch.from_numpy(gt), step)
    got = KLDLoss(**cfg)(jnp.asarray(s), jnp.asarray(t), jnp.asarray(gt),
                         step)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                               atol=1e-8)


def test_shuffle_semantics():
    """The reference draws one fresh shared permutation when
    step % interval == 0 (losses.py:35-42) and applies it to BOTH maps.
    RNG streams differ across frameworks, so assert semantics rather than
    bitwise order: permutation-invariance of the grouped KL under a
    shared channel permutation with group_size=1 (CD), and that the jax
    loss applies the SAME permutation to student and teacher (any
    de-synchronized shuffle changes the value)."""
    from segdistill_tpu.distill.losses import KLDLoss
    s, t = _pair((2, 12, 8, 8), seed=8)
    gt = _gt(2, 8, 8, seed=9)
    cfg = dict(alpha=1, tau=1,
               shuffle_config={'interval': 10},
               transform_config={'loss_type': 'channel', 'group_size': 1})
    # group_size=1: each channel is its own distribution -> any shared
    # permutation leaves the loss invariant. Both sides must equal the
    # unshuffled value on shuffle steps.
    base_cfg = dict(alpha=1, tau=1,
                    transform_config={'loss_type': 'channel',
                                      'group_size': 1})
    want = REF.KLDLoss(**base_cfg)(torch.from_numpy(s),
                                   torch.from_numpy(t),
                                   torch.from_numpy(gt), 10)
    ref_sh = REF.KLDLoss(**cfg)(torch.from_numpy(s), torch.from_numpy(t),
                                torch.from_numpy(gt), 10)
    jax_sh = KLDLoss(**cfg)(jnp.asarray(s), jnp.asarray(t),
                            jnp.asarray(gt), 10,
                            rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(ref_sh), float(want), rtol=1e-6)
    np.testing.assert_allclose(float(jax_sh), float(want), rtol=1e-6)
