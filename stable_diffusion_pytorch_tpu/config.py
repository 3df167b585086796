"""Config system: dataclasses -> argparse -> nested ConfigNode.

Replicates the flag surface of the reference's fairseq-style config stack
(``/root/reference/utils/parse_args.py:262-309``, ``stable_diffusion/dataclass.py:15-68``):
every component declares a dataclass whose fields become ``--dashed-flags`` with the
same names, defaults, choices and help strings, grouped into
``log/train/optim/dataset/checkpoint`` and ``model.{unet,autoencoder,clip,ddpm}``.

Differences from the reference (deliberate, documented):
- No OmegaConf dependency: ``ConfigNode`` is a small mutable attribute-tree with the
  subset of DictConfig behavior the trainers use (attribute access, item access,
  nesting, ``to_dict``).
- ``List[int]`` flags accept both ``"160,320"`` and ``"[160,320]"`` like the reference
  (parse_args.py:71-81) but the *default* round-trips as a real list, not the
  comma-joined string the reference stores (parse_args.py:174-178) — that reference
  behavior hands a raw ``str`` to the model constructor and is treated as a bug here.
- bool flags keep the reference's inversion semantics: a field with ``default=True``
  becomes a ``store_false`` flag (parse_args.py:188-192), so e.g. ``--center-crop``
  *disables* center-cropping. Quirky, but it is the published CLI surface.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import os
import re
from dataclasses import MISSING, dataclass, fields
from enum import Enum
from typing import Any, Dict, List, Optional, Tuple, Type


@dataclass
class BaseConfig:
    """Base dataclass with the introspection helpers the converter uses.

    Mirrors the helper surface of the reference ``BaseDataclass``
    (/root/reference/stable_diffusion/dataclass.py:25-68).
    """

    def _get_all_attributes(self) -> List[str]:
        return list(self.__dataclass_fields__.keys())

    def _get_meta(self, name: str, meta: str, default: Optional[Any] = None) -> Any:
        return self.__dataclass_fields__[name].metadata.get(meta, default)

    def _get_name(self, name: str) -> str:
        return self.__dataclass_fields__[name].name

    def _get_default(self, name: str) -> Any:
        f = self.__dataclass_fields__[name]
        if not isinstance(f.default_factory, dataclasses._MISSING_TYPE):
            return f.default_factory()
        return f.default

    def _get_type(self, name: str) -> Any:
        return self.__dataclass_fields__[name].type

    def _get_help(self, name: str) -> Any:
        return self._get_meta(name, "help")

    def _get_choices(self, name: str) -> Any:
        return self._get_meta(name, "choices")


class ConfigNode:
    """A mutable nested attribute container (minimal DictConfig stand-in)."""

    def __init__(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            setattr(self, k, v)

    # dict-style access used by the reference trainers
    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ConfigNode":
        node = cls()
        for k, v in d.items():
            setattr(node, k, cls.from_dict(v) if isinstance(v, dict) else v)
        return node

    def __repr__(self) -> str:
        return f"ConfigNode({self.__dict__!r})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, ConfigNode):
            return self.__dict__ == other.__dict__
        return NotImplemented


def _eval_str_list(x: Any, x_type: type = float) -> Optional[list]:
    """Parse "1,2" / "[1, 2]" / scalar into a typed list (parse_args.py:71-81)."""
    if x is None:
        return None
    if isinstance(x, str):
        if len(x) == 0:
            return []
        try:
            x = ast.literal_eval(x)
        except (ValueError, SyntaxError):
            x = [p for p in x.split(",") if p != ""]
    try:
        return list(map(x_type, x))
    except TypeError:
        return [x_type(x)]


def _interpret_type(field_type: Any) -> Any:
    """Unwrap Optional[T] / Union[T, None] to T (parse_args.py:83-95)."""
    if field_type is Any:
        return str
    typestring = str(field_type)
    if (
        re.match(r"(typing\.|^)Union\[(.*), NoneType\]$", typestring)
        or typestring.startswith("typing.Optional")
        or typestring.endswith("| None")
    ):
        return field_type.__args__[0]
    return field_type


def add_dataclass_args(
    parser: argparse.ArgumentParser, data_class: Type[BaseConfig]
) -> None:
    """Add one dataclass's fields to the parser as a named argument group.

    Field-name-to-flag mapping and bool/list/enum handling follow
    /root/reference/utils/parse_args.py:97-256.
    """
    group_name = data_class.__name__.lower().replace("config", "")
    group = parser.add_argument_group(group_name)
    instance = data_class()
    # resolve PEP 563 stringified annotations to real types
    import typing

    hints = typing.get_type_hints(data_class)

    for k in instance._get_all_attributes():
        if k == "_name":
            continue
        flag = "--" + k.replace("_", "-")
        field_type = hints.get(k, instance._get_type(k))
        inter_type = _interpret_type(field_type)
        default = instance._get_default(k)
        helpstr = instance._get_help(k)
        choices = instance._get_choices(k)

        kwargs: Dict[str, Any] = {"help": helpstr}
        if choices is not None:
            kwargs["choices"] = choices

        type_str = str(inter_type)
        is_list = (
            isinstance(inter_type, type)
            and issubclass(inter_type, (list, tuple))
        ) or ("List" in type_str or "Tuple" in type_str or "list[" in type_str)

        if is_list:
            if "int" in type_str:
                kwargs["type"] = lambda x: _eval_str_list(x, int)
            elif "float" in type_str:
                kwargs["type"] = lambda x: _eval_str_list(x, float)
            elif "str" in type_str:
                kwargs["type"] = lambda x: _eval_str_list(x, str)
            else:
                raise NotImplementedError(f"cannot parse list type {inter_type}")
            if default is not MISSING:
                kwargs["default"] = list(default) if default is not None else None
        elif (isinstance(inter_type, type) and issubclass(inter_type, Enum)) or (
            "Enum" in type_str
        ):
            kwargs["type"] = str
            if default is not MISSING:
                kwargs["default"] = (
                    default.value if isinstance(default, Enum) else default
                )
        elif inter_type is bool:
            # reference behavior: default True => store_false (parse_args.py:188-192)
            kwargs["action"] = "store_false" if default is True else "store_true"
            kwargs["default"] = default
            kwargs.pop("choices", None)
        else:
            kwargs["type"] = inter_type
            if default is MISSING:
                kwargs["required"] = True
            else:
                kwargs["default"] = default

        try:
            group.add_argument(flag, **kwargs)
        except argparse.ArgumentError:
            # duplicate flag across groups: first one wins (parse_args.py:249-256)
            pass


def add_legacy_args(
    parser: argparse.ArgumentParser,
    data_class: Type[BaseConfig],
    group_name: Optional[str] = None,
    only: Optional[List[str]] = None,
    overrides: Optional[Dict[str, Any]] = None,
    extras: Optional[List[Dict[str, Any]]] = None,
) -> Any:
    """DEPRECATED legacy argparse surface (pre-dataclass style).

    Counterpart of the reference's deprecated ``add_*_args`` staticmethods
    (/root/reference/stable_diffusion/models/unet.py:110-162, scheduler.py:26-50,
    clip_model.py:31-54, autoencoder.py:53-91, trainer_args.py:94-164): flags
    keep raw underscores (``--n_heads`` not ``--n-heads``), List fields use
    ``nargs='+'`` instead of comma-string parsing, and ``overrides`` carries
    the legacy defaults where they differ from the live dataclass (e.g. the
    reference's legacy ``--n_heads`` default of 1 vs the dataclass's 8).
    Prefer ``load_config`` / ``add_dataclass_args``; kept only so code written
    against the reference's legacy surface ports one-for-one.
    """
    import typing
    import warnings

    warnings.warn(
        f"add_legacy_args({data_class.__name__}) is deprecated; use load_config",
        DeprecationWarning,
        stacklevel=3,
    )
    overrides = overrides or {}
    group = parser.add_argument_group(
        group_name or data_class.__name__.lower().replace("config", "")
    )
    instance = data_class()
    hints = typing.get_type_hints(data_class)
    names = only if only is not None else instance._get_all_attributes()
    for k in names:
        if k == "_name":
            continue
        inter_type = _interpret_type(hints.get(k, instance._get_type(k)))
        default = overrides.get(k, instance._get_default(k))
        kwargs: Dict[str, Any] = {"help": instance._get_help(k)}
        choices = instance._get_choices(k)
        if choices is not None:
            kwargs["choices"] = choices
        type_str = str(inter_type)
        if "List" in type_str or "list" in type_str:
            kwargs["type"] = int if "int" in type_str else (
                float if "float" in type_str else str
            )
            kwargs["nargs"] = "+"
            kwargs["default"] = list(default) if default is not None else None
        elif inter_type is bool:
            kwargs["action"] = "store_false" if default is True else "store_true"
            kwargs["default"] = default
            kwargs.pop("choices", None)
        else:
            kwargs["type"] = inter_type
            kwargs["default"] = None if default is MISSING else default
        group.add_argument(f"--{k}", **kwargs)
    for extra in extras or []:
        extra = dict(extra)
        group.add_argument(extra.pop("flag"), **extra)
    return group


def convert_dataclass_to_argparse(
    data_classes: List[Type[BaseConfig]], parser: argparse.ArgumentParser
) -> None:
    """DEPRECATED alias kept for surface parity with the reference's broken
    helper (/root/reference/utils/parse_args.py:32-58, flagged '# TODO: fix
    bug: type' there); delegates to the working ``add_dataclass_args``."""
    import warnings

    warnings.warn(
        "convert_dataclass_to_argparse is deprecated; use load_config",
        DeprecationWarning,
        stacklevel=2,
    )
    for data_class in data_classes:
        add_dataclass_args(parser, data_class)


def dataclasses_to_confignode(
    data_classes: List[Type[BaseConfig]], args: argparse.Namespace
) -> ConfigNode:
    """Build {groupname: ConfigNode(fields...)} from parsed args
    (parse_args.py:292-302)."""
    cfg = ConfigNode()
    for data_class in data_classes:
        group_name = data_class.__name__.lower().replace("config", "")
        node = ConfigNode()
        for field_info in fields(data_class):
            name = field_info.name
            if hasattr(args, name):
                setattr(node, name, getattr(args, name))
        cfg[group_name] = node
    return cfg


def _train_data_classes() -> List[Type[BaseConfig]]:
    from stable_diffusion_pytorch_tpu.trainers.args import (
        CheckpointConfig,
        LogConfig,
        OptimConfig,
        TrainConfig,
    )
    from stable_diffusion_pytorch_tpu.utils.data import DatasetConfig

    return [LogConfig, TrainConfig, OptimConfig, DatasetConfig, CheckpointConfig]


def _model_data_classes() -> List[Type[BaseConfig]]:
    from stable_diffusion_pytorch_tpu.models.autoencoder import AutoencoderConfig
    from stable_diffusion_pytorch_tpu.models.clip import ClipConfig
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig
    from stable_diffusion_pytorch_tpu.models.unet import UnetConfig

    return [UnetConfig, AutoencoderConfig, ClipConfig, DDPMConfig]


def _extra_data_classes() -> List[Type[BaseConfig]]:
    """Groups the reference does not have: TPU runtime + compat switches."""
    from stable_diffusion_pytorch_tpu.parallel.args import ParallelConfig
    from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig

    return [CompatConfig, ParallelConfig]


def load_config(
    argv: Optional[List[str]] = None,
    extra_data_classes: Optional[List[Type[BaseConfig]]] = None,
) -> Tuple[argparse.Namespace, ConfigNode]:
    """Parse CLI flags into (args, cfg) with the reference's nested group layout:
    ``cfg.{log,train,optim,dataset,checkpoint,compat,parallel}`` and
    ``cfg.model.{unet,autoencoder,clip,ddpm}`` (parse_args.py:262-309).

    ``extra_data_classes`` lets entry points add their own groups (e.g. the
    txt2img CLI adds a ``sampling`` group).

    ``--config-file preset.json`` loads a JSON dict of {field_name: value}
    defaults applied below explicit CLI flags — the TPU analog of the
    reference's accelerate_config YAMLs (SURVEY.md §2 component 20); presets
    ship in ``stable_diffusion_pytorch_tpu/config_presets/``."""
    train_dcs = _train_data_classes()
    model_dcs = _model_data_classes()
    extra_dcs = _extra_data_classes() + list(extra_data_classes or [])

    parser = argparse.ArgumentParser(
        description="stable_diffusion_pytorch_tpu: TPU-native stable diffusion"
    )
    parser.add_argument(
        "--config-file",
        type=str,
        default=None,
        help="JSON preset of flag defaults (CLI flags still win); "
        "see stable_diffusion_pytorch_tpu/config_presets/",
    )
    for dc in train_dcs + model_dcs + extra_dcs:
        add_dataclass_args(parser, dc)

    # peek for --config-file and install its values as parser defaults
    import json
    import sys as _sys

    peek_argv = list(argv) if argv is not None else _sys.argv[1:]
    if "--config-file" in peek_argv:
        path = peek_argv[peek_argv.index("--config-file") + 1]
        preset_dir = os.path.join(os.path.dirname(__file__), "config_presets")
        if not os.path.exists(path):
            candidate = os.path.join(preset_dir, path)
            path = candidate if os.path.exists(candidate) else path
        with open(path) as f:
            preset = json.load(f)
        values = {k: v for k, v in preset.items() if not k.startswith("_")}
        # argparse.set_defaults silently accepts unknown keys — a typo'd
        # preset field would be dropped without a word; fail loudly instead
        known = {a.dest for a in parser._actions}
        unknown = sorted(set(values) - known)
        if unknown:
            parser.error(
                f"unknown preset field(s) {unknown} in {path}; "
                "fields must match flag dests (e.g. steps_per_dispatch)"
            )
        parser.set_defaults(**values)

    args = parser.parse_args(argv)

    cfg = dataclasses_to_confignode(train_dcs + extra_dcs, args)
    cfg["model"] = dataclasses_to_confignode(model_dcs, args)
    return args, cfg


def compat_from_cfg(cfg: ConfigNode):
    """Materialize the CompatConfig (with reference_compat fan-out) from a parsed
    config tree."""
    from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig

    node = cfg["compat"] if "compat" in cfg else None
    if node is None:
        return CompatConfig()
    return CompatConfig(**dict(node.items())).resolved()
