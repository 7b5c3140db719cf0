"""Method registry: named training recipes for the CLI.

Equivalent of nerfstudio's ``MethodSpecification`` entry points
(``pyproject.toml:20-23`` registers ``neusky``, ``neusky-synthetic``,
``ddf``).  Specs are plain dataclasses holding the full config tree; any
leaf is overridable from the CLI (``--model.num_illumination_directions
256``-style dotted paths, see ``neusky_tpu/cli.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional


@dataclasses.dataclass
class MethodSpec:
    name: str
    description: str
    build: Callable[..., Dict[str, Any]]
    """Returns dict with keys: model_config, pipeline_config, trainer_config,
    optimizer_groups, datamanager_factory."""


METHOD_REGISTRY: Dict[str, MethodSpec] = {}


def register_method(spec: MethodSpec) -> MethodSpec:
    METHOD_REGISTRY[spec.name] = spec
    return spec
