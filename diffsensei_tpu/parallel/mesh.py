"""Device mesh + sharding layer: the TPU-native replacement for NCCL/Accelerate.

The reference distributes exclusively via HF Accelerate DDP over NCCL
(``scripts/train/train.py:85-88,287-289``, ``accelerate launch --multi_gpu``,
``README.md:127-149``) with no tensor/pipeline/sequence parallelism anywhere
(SURVEY.md §2.5). The TPU equivalent is declarative: a ``jax.sharding.Mesh``
with named axes, ``NamedSharding`` annotations on params and batches, and XLA
inserting the collectives (psum for grad sync ≙ DDP all-reduce; all-gather /
reduce-scatter for the model axis) over ICI.

Axes:
  * ``data``  — batch sharding (DDP equivalent). Diffusion training uses this
    axis alone, matching the reference's scaling story.
  * ``model`` — tensor parallelism for the SEED-X-class LLM (shard attention
    heads and MLP hidden), required to fit a 13B-param LLM on v5e chips; the
    reference has no TP and simply requires big GPUs.

Multi-host: call ``jax.distributed.initialize`` before ``make_mesh`` and the
same code runs across hosts (mesh axes lay out over ICI within a slice, DCN
across slices — axis order puts ``model`` innermost so TP collectives ride ICI).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.num_devices > len(devices):
        raise ValueError(
            f"mesh {spec} needs {spec.num_devices} devices, have {len(devices)}")
    grid = np.asarray(devices[: spec.num_devices]).reshape(spec.data, spec.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Sharding rules: regex on the flattened param path → PartitionSpec
# ---------------------------------------------------------------------------
Rule = Tuple[str, P]


def unet_param_sharding_rules() -> Sequence[Rule]:
    """Diffusion stack: replicate params (DDP); batch carries the data axis.

    SDXL's UNet (~2.6B params in bf16 ≈ 5 GB) fits per-chip; replication keeps
    every matmul local, exactly the reference's DDP strategy but with XLA psum
    doing the gradient sync.
    """
    return ((".*", P()),)


def llm_param_sharding_rules() -> Sequence[Rule]:
    """SEED-X-class LLM: Megatron-style TP over the ``model`` axis.

    Column-parallel q/k/v and MLP-in (shard output features), row-parallel
    attention-out and MLP-down (shard input features): one all-reduce per
    block, riding ICI. Embeddings shard on vocab; norms replicate.
    """
    return (
        (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.kernel", P(None, MODEL_AXIS)),
        (r".*(o_proj|down_proj)\.kernel", P(MODEL_AXIS, None)),
        (r".*embed_tokens\.embedding", P(MODEL_AXIS, None)),
        (r".*lm_head\.kernel", P(None, MODEL_AXIS)),
        # int8 weight-only serving layout (models/mllm/quant.py): the int8
        # matrix shards like its bf16 counterpart; the per-out-channel scale
        # vector shards with the output dim (replicated for row-parallel).
        (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.base\.kernel_q",
         P(None, MODEL_AXIS)),
        (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.base\.kernel_scale",
         P(MODEL_AXIS)),
        (r".*(o_proj|down_proj)\.base\.kernel_q", P(MODEL_AXIS, None)),
        (r".*lm_head\.kernel_q", P(None, MODEL_AXIS)),
        (r".*lm_head\.kernel_scale", P(MODEL_AXIS)),
        (r".*", P()),
    )


# ---------------------------------------------------------------------------
# FSDP / ZeRO-style parameter + optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------

# Leaves smaller than this replicate: sharding norm scales and biases buys
# no memory and costs an all-gather each. 64 KiB ≈ a [128, 128] fp32 kernel.
FSDP_MIN_SIZE = 65536


def fsdp_spec(shape: Tuple[int, ...], num_shards: int,
              min_size: int = FSDP_MIN_SIZE) -> P:
    """PartitionSpec sharding the largest ``num_shards``-divisible dim of
    ``shape`` over the data axis; replicated when none divides or the leaf
    is small.

    This is the TPU-native ZeRO-3/FSDP: parameters, gradients, and (via
    ``jnp.zeros_like`` sharding propagation in ``optax``'s init) optimizer
    moments all live sharded over the ``data`` axis; XLA's SPMD partitioner
    inserts the all-gathers (param use) and reduce-scatters (grad sync) the
    reference delegates to DDP+NCCL — except the reference replicates
    everything per GPU, which cannot hold SDXL full-tune AdamW state
    (5.2 GB params + 5.2 grads + 10.4 moments in bf16) on a 16 GB chip.
    """
    size = 1
    for d in shape:
        size *= d
    if size < min_size or not shape:
        return P()
    for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if shape[dim] % num_shards == 0 and shape[dim] >= num_shards:
            return P(*[DATA_AXIS if i == dim else None
                       for i in range(len(shape))])
    return P()


def fsdp_param_specs(params: Any, mesh: Mesh,
                     min_size: int = FSDP_MIN_SIZE) -> Any:
    """Per-leaf FSDP PartitionSpecs for an arbitrary param/opt-state tree."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda x: fsdp_spec(getattr(x, "shape", ()), n, min_size), params)


def shard_params_fsdp(params: Any, mesh: Mesh,
                      min_size: int = FSDP_MIN_SIZE) -> Any:
    """Place a param pytree FSDP-sharded over the mesh's data axis."""
    specs = fsdp_param_specs(params, mesh, min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def spec_for(path: str, rules: Sequence[Rule]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_specs(params: Any, rules: Sequence[Rule]) -> Any:
    """PartitionSpec pytree matching ``params`` via the first-match rule list."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: spec_for(_path_str(path), rules), params)


def shard_params(params: Any, mesh: Mesh, rules: Sequence[Rule]) -> Any:
    """Place a param pytree onto the mesh according to the rules."""
    specs = param_specs(params, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every batch leaf along its leading (batch) dim on the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def batch_specs(batch: Any) -> Any:
    return jax.tree.map(lambda _: P(DATA_AXIS), batch)
