"""PyTorch checkpoint -> JAX parameter-tree converter.

Loads the reference's released ``.pth`` checkpoints ({optimizer, model, ema,
step} torch pickles, reference lib/diffusion/utils.py:23-30; model keys carry
the DataParallel ``module.`` prefix, models/utils.py:95) into this
framework's flax trees.

The mapping is deterministic because the torch model is a flat
``all_modules`` ModuleList in construction order (reference
ddpm_res64.py:58-122, ddpm_res128.py:62-133). ``module_walk`` replays that
construction order from the config, yielding
(torch module path, flax module name, kind). Tensor layout conversions:

* Linear   weight (out, in)            -> Dense kernel (in, out)      [T]
* Conv3d   weight (O, I, kd, kh, kw)   -> Conv kernel (kd, kh, kw, I, O)
* GroupNorm weight/bias                -> scale/bias
* NIN      W (in, out), b              -> unchanged

EMA shadow params are stored as an ORDERED LIST over
``[p for p in model.parameters() if p.requires_grad]`` (reference
models/ema.py:28-29); the same walk reproduces that order (res128 quirk: a
dormant ``pos_layer`` exists in the torch model and its EMA slots must be
skipped — reference ddpm_res128.py:90 creates it though forward never uses
it when use_coords is False).
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _model_arch(config):
    """Static architecture facts shared with models/unet3d.py."""
    m = config.model
    is_128 = 'res128' in m.name
    num_res_blocks_first = (m.get('num_res_blocks_first', 2) if is_128 else None)
    ch_mult = tuple(m.ch_mult)
    R = config.data.image_size
    all_res = [R // (2 ** i) for i in range(len(ch_mult))]
    return dict(is_128=is_128, ch_mult=ch_mult, all_res=all_res,
                attn=tuple(m.attn_resolutions),
                nb=m.num_res_blocks, nb_first=num_res_blocks_first)


def _level_blocks(arch, i_level):
    if i_level == 0 and arch['nb_first'] is not None:
        return arch['nb_first']
    return arch['nb']


def module_walk(config) -> Iterator[Tuple[str, str, str]]:
    """Yield (torch_prefix, flax_name, kind) in torch construction order.

    kind in {'linear', 'conv', 'resblock', 'attn', 'down', 'up',
    'groupnorm'}. torch_prefix is relative to the (DataParallel-stripped)
    model state dict; all_modules entries are 'all_modules.{i}'.
    """
    arch = _model_arch(config)
    L = len(arch['ch_mult'])
    i = 0

    def nxt():
        nonlocal i
        v = f'all_modules.{i}'
        i += 1
        return v

    yield nxt(), 'temb_0', 'linear'
    yield nxt(), 'temb_1', 'linear'
    # pos/mask stem convs are separate attributes, not in all_modules
    yield 'pos_layer', 'pos_layer', 'conv'    # dormant in res128
    yield 'mask_layer', 'mask_layer', 'conv'
    yield nxt(), 'stem', 'conv'

    for lev in range(L):
        for blk in range(_level_blocks(arch, lev)):
            yield nxt(), f'down_{lev}_{blk}', 'resblock'
            if arch['all_res'][lev] in arch['attn']:
                yield nxt(), f'down_{lev}_{blk}_attn', 'attn'
        if lev != L - 1:
            yield nxt(), f'down_{lev}_downsample', 'down'

    yield nxt(), 'mid_0', 'resblock'
    yield nxt(), 'mid_attn', 'attn'
    yield nxt(), 'mid_1', 'resblock'

    for lev in reversed(range(L)):
        for blk in range(_level_blocks(arch, lev) + 1):
            yield nxt(), f'up_{lev}_{blk}', 'resblock'
        if arch['all_res'][lev] in arch['attn']:
            yield nxt(), f'up_{lev}_attn', 'attn'
        if lev != 0:
            yield nxt(), f'up_{lev}_upsample', 'up'

    yield nxt(), 'out_norm', 'groupnorm'
    yield nxt(), 'out_conv', 'conv'


# per-kind: ordered (torch_param_suffix, flax_subpath, transform) templates.
_T = lambda w: np.ascontiguousarray(np.asarray(w).T)
_CONV = lambda w: np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))
_ID = np.asarray

_KIND_PARAMS = {
    'linear': [('weight', ('kernel',), _T), ('bias', ('bias',), _ID)],
    'conv': [('weight', ('conv', 'kernel'), _CONV),
             ('bias', ('conv', 'bias'), _ID)],
    'groupnorm': [('weight', ('norm', 'scale'), _ID),
                  ('bias', ('norm', 'bias'), _ID)],
    'down': [('Conv_0.weight', ('Conv_0', 'conv', 'kernel'), _CONV),
             ('Conv_0.bias', ('Conv_0', 'conv', 'bias'), _ID)],
    'up': [('Conv_0.weight', ('Conv_0', 'conv', 'kernel'), _CONV),
           ('Conv_0.bias', ('Conv_0', 'conv', 'bias'), _ID)],
    'attn': [('GroupNorm_0.weight', ('GroupNorm_0', 'norm', 'scale'), _ID),
             ('GroupNorm_0.bias', ('GroupNorm_0', 'norm', 'bias'), _ID),
             ('NIN_0.W', ('NIN_0', 'W'), _ID), ('NIN_0.b', ('NIN_0', 'b'), _ID),
             ('NIN_1.W', ('NIN_1', 'W'), _ID), ('NIN_1.b', ('NIN_1', 'b'), _ID),
             ('NIN_2.W', ('NIN_2', 'W'), _ID), ('NIN_2.b', ('NIN_2', 'b'), _ID),
             ('NIN_3.W', ('NIN_3', 'W'), _ID), ('NIN_3.b', ('NIN_3', 'b'), _ID)],
}


def _resblock_params(torch_keys, prefix):
    """ResnetBlockDDPM param list; NIN shortcut present only when in!=out
    (reference layers.py:663-667)."""
    entries = [
        ('GroupNorm_0.weight', ('GroupNorm_0', 'norm', 'scale'), _ID),
        ('GroupNorm_0.bias', ('GroupNorm_0', 'norm', 'bias'), _ID),
        ('Conv_0.weight', ('Conv_0', 'conv', 'kernel'), _CONV),
        ('Conv_0.bias', ('Conv_0', 'conv', 'bias'), _ID),
        ('Dense_0.weight', ('Dense_0', 'kernel'), _T),
        ('Dense_0.bias', ('Dense_0', 'bias'), _ID),
        ('GroupNorm_1.weight', ('GroupNorm_1', 'norm', 'scale'), _ID),
        ('GroupNorm_1.bias', ('GroupNorm_1', 'norm', 'bias'), _ID),
        ('Conv_1.weight', ('Conv_1', 'conv', 'kernel'), _CONV),
        ('Conv_1.bias', ('Conv_1', 'conv', 'bias'), _ID),
    ]
    if f'{prefix}.NIN_0.W' in torch_keys:
        entries += [('NIN_0.W', ('NIN_0', 'W'), _ID),
                    ('NIN_0.b', ('NIN_0', 'b'), _ID)]
    return entries


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return { (k[len('module.'):] if k.startswith('module.') else k): v
             for k, v in sd.items() }


def _set_path(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_model_state(torch_state: Dict[str, np.ndarray], config) -> dict:
    """torch model state_dict -> flax {'params': ...} tree (float32)."""
    sd = _strip_prefix(torch_state)
    arch = _model_arch(config)
    params: dict = {}
    for tprefix, fname, kind in module_walk(config):
        if kind == 'resblock':
            entries = _resblock_params(sd, tprefix)
        else:
            entries = _KIND_PARAMS[kind]
        if arch['is_128'] and fname == 'pos_layer':
            continue  # dormant in res128 forward; our model has no params for it
        for suffix, fpath, tf in entries:
            key = f'{tprefix}.{suffix}'
            if key not in sd:
                raise KeyError(f'missing torch param {key} for flax {fname}')
            _set_path(params, (fname,) + fpath,
                      jnp.asarray(tf(sd[key]), jnp.float32))
    return {'params': params}


def convert_ema_state(shadow_params: List[np.ndarray],
                      torch_state: Dict[str, np.ndarray], config) -> dict:
    """torch EMA shadow list -> flax {'params': ...} tree.

    shadow_params is ordered like [p for p in model.parameters() if
    p.requires_grad]. parameters() order interleaves pos_layer/mask_layer
    BEFORE all_modules (attribute registration order), while module_walk
    yields them in that same relative position — so a single pass works.
    """
    sd = _strip_prefix(torch_state)
    arch = _model_arch(config)
    params: dict = {}
    idx = 0
    # torch model.parameters() follows attribute REGISTRATION order:
    # pos_layer, mask_layer first (reference ddpm_res64.py:85-86), then
    # all_modules by index — NOT the all_modules construction interleaving.
    walk = list(module_walk(config))
    stem_convs = [w for w in walk if w[1] in ('pos_layer', 'mask_layer')]
    rest = [w for w in walk if w[1] not in ('pos_layer', 'mask_layer')]
    for tprefix, fname, kind in stem_convs + rest:
        entries = (_resblock_params(sd, tprefix) if kind == 'resblock'
                   else _KIND_PARAMS[kind])
        drop = arch['is_128'] and fname == 'pos_layer'
        for suffix, fpath, tf in entries:
            if idx >= len(shadow_params):
                raise IndexError('EMA shadow list shorter than expected')
            val = shadow_params[idx]
            idx += 1
            if drop:
                continue
            expect = sd[f'{tprefix}.{suffix}']
            if tuple(np.asarray(val).shape) != tuple(np.asarray(expect).shape):
                raise ValueError(
                    f'EMA order mismatch at {tprefix}.{suffix}: '
                    f'{np.asarray(val).shape} vs {np.asarray(expect).shape}')
            _set_path(params, (fname,) + fpath,
                      jnp.asarray(tf(val), jnp.float32))
    if idx != len(shadow_params):
        raise ValueError(f'consumed {idx} of {len(shadow_params)} EMA entries')
    return {'params': params}


def load_torch_checkpoint(path: str, config, state):
    """Full checkpoint load: returns ``state`` with params/ema/step replaced.

    The torch Adam optimizer state is NOT imported (different optimizer
    implementation); fine for eval, and for finetuning Adam moments rebuild
    within ~1k steps.
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    model_sd = {k: v.numpy() for k, v in ckpt['model'].items()
                if isinstance(v, torch.Tensor)}
    params = convert_model_state(model_sd, config)
    new_state = state.replace(params=params,
                              step=jnp.asarray(int(ckpt.get('step', 0)), jnp.int32))
    ema = ckpt.get('ema')
    if ema and ema.get('shadow_params') is not None:
        shadow = [p.detach().cpu().numpy() for p in ema['shadow_params']]
        ema_params = convert_ema_state(shadow, model_sd, config)
        new_state = new_state.replace(
            ema_params=ema_params,
            ema_num_updates=jnp.asarray(int(ema.get('num_updates') or 0),
                                        jnp.int32))
    else:
        new_state = new_state.replace(ema_params=jax.tree.map(jnp.copy, params))
    logger.info('converted torch checkpoint %s (step=%d)', path,
                int(new_state.step))
    return new_state
