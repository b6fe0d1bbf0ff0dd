"""Typed config system: YAML + dotlist overrides + registry instantiation.

Replaces the reference's OmegaConf ``target:`` class-path machinery
(/root/reference/ldm/util.py:78-95, main.py:530-548) with an explicit
registry: configs are plain dicts loaded from YAML, merged left-to-right,
overridden by ``key.path=value`` dotlist args, and instantiated through
``REGISTRY`` — a typo in a target name fails loudly at load time instead of
at import time deep in a run.
"""
from __future__ import annotations

import ast
from typing import Any, Callable, Dict, List, Optional

import yaml

REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def merge(*dicts: Dict) -> Dict:
    """Deep merge, later dicts win (OmegaConf.merge semantics)."""
    out: Dict = {}
    for d in dicts:
        for k, v in (d or {}).items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
    return out


def apply_dotlist(cfg: Dict, overrides: List[str]) -> Dict:
    """['model.params.lr=1e-4', ...] applied in place."""
    for item in overrides:
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def load_config(paths: List[str], overrides: Optional[List[str]] = None) -> Dict:
    cfg = merge(*[load_yaml(p) for p in paths])
    if overrides:
        apply_dotlist(cfg, overrides)
    return cfg


def instantiate(spec: Dict, **extra) -> Any:
    """{'target': name, 'params': {...}} -> REGISTRY[name](**params, **extra)."""
    if "target" not in spec:
        raise KeyError(f"config node missing 'target': {list(spec)}")
    name = spec["target"]
    if name not in REGISTRY:
        raise KeyError(
            f"unknown target {name!r}; registered: {sorted(REGISTRY)}"
        )
    params = dict(spec.get("params") or {})
    params.update(extra)
    return REGISTRY[name](**params)


def apply_to_dataclass(instance, cfg: Optional[Dict]):
    """Apply a (possibly nested) config dict ON TOP of an existing
    dataclass instance via ``dataclasses.replace`` — non-default values
    already baked into the instance (e.g. PipelineConfig's
    ``VAEConfig(num_frames=5, enable_fusion=True)`` factory) survive keys
    the config doesn't mention.

    Nested dataclass fields recurse, lists coerce to tuples where the
    current value is a tuple, and ``dtype`` fields accept jnp dtype names
    ("bfloat16"). Unknown keys fail loudly with the valid key set.
    """
    import dataclasses

    cfg = dict(cfg or {})
    fields = {f.name for f in dataclasses.fields(instance)}
    kwargs: Dict[str, Any] = {}
    for key, value in cfg.items():
        if key not in fields:
            raise KeyError(
                f"{type(instance).__name__}: unknown config key {key!r}; "
                f"valid: {sorted(fields)}")
        current = getattr(instance, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            value = apply_to_dataclass(current, value)
        elif key == "dtype" and isinstance(value, str):
            import jax.numpy as jnp

            value = jnp.dtype(value)
        elif isinstance(current, tuple) and isinstance(value, list):
            value = tuple(value)
        kwargs[key] = value
    return dataclasses.replace(instance, **kwargs)


def build_dataclass(cls, cfg: Optional[Dict]):
    """Construct dataclass ``cls`` from a config dict (all fields of
    ``cls`` must have defaults; see :func:`apply_to_dataclass`)."""
    return apply_to_dataclass(cls(), cfg)


def pipeline_config_from_dict(cfg: Optional[Dict]):
    """The ``model:`` config subtree -> ``PipelineConfig``.

    ``model.num_frames`` propagates into the unet/structcond/vae
    sub-configs unless the subtree pins its own value — the temporal
    modules reshape the flattened (b t) axis by their num_frames, so a
    mismatch is a shape error (or silent mis-grouping) at runtime.
    """
    import dataclasses

    from mgldvsr_tpu.infer.pipeline import PipelineConfig

    cfg = dict(cfg or {})
    pc = build_dataclass(PipelineConfig, cfg)
    if "num_frames" in cfg:
        t = cfg["num_frames"]
        for name in ("unet", "structcond", "vae"):
            if "num_frames" not in (cfg.get(name) or {}):
                pc = dataclasses.replace(
                    pc, **{name: dataclasses.replace(
                        getattr(pc, name), num_frames=t)})
    return pc


# ---------------------------------------------------------------------------
# standard registrations
# ---------------------------------------------------------------------------


def _register_defaults():
    from mgldvsr_tpu.data.datasets import (
        REDSAutoencoderDataset,
        RealVSRRecurrentDataset,
        VideoFolderDataset,
    )
    from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig
    from mgldvsr_tpu.flow.spynet import SpyNet

    REGISTRY.setdefault("data.realvsr_recurrent", RealVSRRecurrentDataset)
    REGISTRY.setdefault("data.reds_autoencoder", REDSAutoencoderDataset)
    REGISTRY.setdefault("data.video_folder", VideoFolderDataset)
    REGISTRY.setdefault("flow.raft", lambda **kw: RAFT(RAFTConfig(**kw)))
    REGISTRY.setdefault("flow.spynet", lambda **kw: SpyNet(**kw))


_register_defaults()
