"""Inference API (ref contract: mmseg/apis/inference.py:11-119)."""

import jax
import numpy as np

from ..config import Config
from ..datasets.pipelines import Compose
from ..models import build_segmentor
from .test import _jit_inference, _predict_one


def init_segmentor(config, checkpoint=None, rng_seed=0,
                   input_shape=(1, 512, 512, 3)):
    """Build a segmentor + its variables. -> (model, variables)
    (ref inference.py:11-39)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model_cfg = dict(config.model)
    if 'pretrained' in model_cfg:
        model_cfg['pretrained'] = None
    model = build_segmentor(model_cfg)
    variables = model.init_variables(jax.random.key(rng_seed), input_shape)
    if 'teacher' in variables:
        variables = variables['student']
        model_for_load = model.student
    else:
        model_for_load = model
    if checkpoint is not None:
        import os.path as osp
        if osp.isdir(checkpoint):
            # orbax work dir / checkpoint dir produced by training
            variables = _load_orbax_student(checkpoint, variables)
        else:
            from ..convert import load_pth_into_variables
            variables = load_pth_into_variables(variables, checkpoint,
                                                model_for_load,
                                                strict=False)
    model.cfg = config
    return model, variables


def _load_orbax_student(path, variables):
    """Restore student variables from a training work dir (or a raw orbax
    dir saved by tools/convert_checkpoint.py)."""
    import os.path as osp

    import orbax.checkpoint as ocp

    ckpt_dir = osp.join(path, 'checkpoints')
    if osp.isdir(ckpt_dir):
        # a training work dir: pull params + model_state out of the
        # TrainState tree (lenient structural restore)
        mgr = ocp.CheckpointManager(osp.abspath(ckpt_dir))
        step = mgr.latest_step()
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
        mgr.close()
        out = {'params': restored['params']}
        out.update(restored.get('model_state', {}))
        return out
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(osp.abspath(path))
    return restored


class _LoadImage:
    """Accept an in-memory array or a path (ref inference.py:42-66)."""

    def __call__(self, results):
        from ..utils import image as imutil
        if isinstance(results['img'], str):
            results['filename'] = results['img']
            results['ori_filename'] = results['img']
            results['img'] = imutil.imread(results['img'])
        else:
            results['filename'] = None
            results['ori_filename'] = None
        img = results['img']
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results


def inference_segmentor(model, variables, img):
    """-> list of seg maps (ref inference.py:69-98)."""
    cfg = model.cfg
    test_pipeline = [_LoadImage()] + list(cfg.data['test']['pipeline'][1:])
    pipeline = Compose(test_pipeline)
    data = pipeline(dict(img=img))
    imgs = data['img'] if isinstance(data['img'], list) else [data['img']]
    metas = data['img_metas'] if isinstance(data['img_metas'], list) \
        else [data['img_metas']]
    compiled = _jit_inference(model)
    pred = _predict_one(model, variables, compiled, imgs, metas)
    return [pred]


def show_result_pyplot(model, img, result, palette=None, fig_size=(15, 10),
                       opacity=0.5, out_file=None):
    """(ref inference.py:101-119)."""
    from ..utils import image as imutil
    if isinstance(img, str):
        img = imutil.imread(img)
    drawn = model.show_result(img, result[0], palette=palette,
                              opacity=opacity)
    if out_file is not None:
        imutil.imwrite(drawn, out_file)
    return drawn
