"""Device mesh and sharding for the stream-parallel decode pipeline.

Parallelism model (SURVEY.md 2.3): streams are embarrassingly parallel,
so the primary mesh axis is ``streams`` (data parallel over batch lanes).
Every decoder array is lane-major; decode runs under shard_map so all
gathers/scatters stay shard-local and ICI carries only control/metric
reductions.  A second ``space`` axis is reserved for intra-frame
parallelism (MB-row sharding of the dense phase / composite synthesis on
very large frames) -- the TP/SP analogue; EP/PP do not apply to this
workload (documented absent, SURVEY.md 2.3).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_streams_axis: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_streams_axis or len(devices)
    devs = np.asarray(devices[:n]).reshape(n)
    return Mesh(devs, axis_names=("streams",))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the lane/stream axis) over the mesh."""
    return NamedSharding(mesh, P("streams"))


def shard_lane_tree(mesh: Mesh, tree):
    """Device-put a pytree of lane-major arrays with axis-0 sharding."""
    s = lane_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def make_sharded_decoder(mesh: Mesh, *, mb_width: int, mb_height: int,
                         max_steps: int):
    """Jitted decode-one-picture-per-lane step running under shard_map
    over the 'streams' axis.  All inputs/outputs are lane-major and
    sharded on axis 0; the scan/gather/scatter machinery stays
    shard-local (zero ICI traffic on the data path)."""
    import inspect
    try:
        from jax import shard_map          # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    # replication checking kwarg was renamed check_rep -> check_vma
    _params = inspect.signature(shard_map).parameters
    _check = {"check_vma": False} if "check_vma" in _params \
        else {"check_rep": False}

    from espflix_tpu.models.mpeg1 import decode_picture_impl

    impl = functools.partial(
        decode_picture_impl, mb_width=mb_width, mb_height=mb_height,
        max_steps=max_steps)

    def wrapped(words, slice_starts, slice_rows, n_slices, pic_type,
                full_pel, r_size, intra_q, non_intra_q, active, frames):
        return impl(words, slice_starts, slice_rows, n_slices, pic_type,
                    full_pel, r_size, intra_q, non_intra_q, active, frames)

    spec = P("streams")
    frames_spec = dict(y=spec, u=spec, v=spec, parity=spec)
    in_specs = (spec,) * 10 + (frames_spec,)
    out_specs = (frames_spec, dict(y=spec, u=spec, v=spec),
                 dict(error=spec, ok=spec, iters=spec))
    return jax.jit(shard_map(
        wrapped, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        **_check))


def gather_metrics(mesh: Mesh, error, iters):
    """Cross-shard metric reduction (the only ICI traffic in the decode
    path): total errored lanes and max scan iterations."""
    @functools.partial(jax.jit, out_shardings=None)
    def reduce(e, i):
        return e.sum(), i.max()
    return reduce(error, iters)
