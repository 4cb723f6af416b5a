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


def shard_axis1_tree(mesh: Mesh, tree):
    """Device-put [K, lanes, ...] stacks with axis-1 'streams'
    sharding (chunked dispatch: lax.scan peels axis 0 per tick)."""
    s = NamedSharding(mesh, P(None, "streams"))
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


def make_sharded_pallas_decoder(mesh: Mesh, *, mb_width: int,
                                mb_height: int, long_rows: int,
                                steps_long: int = 1024,
                                steps_short: int = 384,
                                chunk: int = 128,
                                interpret: bool = False):
    """The PRODUCTION parser under the mesh: slice-parallel Pallas
    scan + matmul scatter + dense phase, shard_map'ed over 'streams'.

    Inputs come from scan_dense.pack_slice_rows_sharded: each shard's
    slice rows are span-sorted within the shard and self-contained
    (local lane_of_row / permutation), so the whole decode stays
    shard-local -- the fastest serving path now expresses under the
    same mesh as the XLA parser (zero data-path ICI).

    long_rows / budgets are per SHARD (static, uniform across shards;
    callers size long_rows for the worst shard's I rows)."""
    import inspect
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    _params = inspect.signature(shard_map).parameters
    _check = {"check_vma": False} if "check_vma" in _params \
        else {"check_rep": False}

    import jax.numpy as jnp
    from espflix_tpu.models import mpeg1 as Mm
    from espflix_tpu.ops import vlc_scan_pallas as VP

    def body(words, start_bits, rows, alive, pic_type, full_pel,
             r_size, lane_of_row, perm, intra_q, non_intra_q, active,
             frames):
        n_loc = active.shape[0]
        coeffs_T, recs, nfinal, err, iters = \
            VP.run_scan_pallas_bucketed_dense(
                words, start_bits, rows, alive, pic_type, full_pel,
                r_size, lane_of_row, perm, mb_width=mb_width,
                mb_height=mb_height, n_lanes=n_loc,
                long_rows=long_rows, steps_long=steps_long,
                steps_short=steps_short,
                chunk=min(chunk, steps_short),
                interpret=interpret, transposed=True)
        frames, pres = Mm.dense_compose(
            None, recs, nfinal, intra_q, non_intra_q, active,
            frames, mb_width=mb_width, mb_height=mb_height,
            use_pallas_mocomp=not interpret, coeffs_T=coeffs_T)
        info = dict(error=err, ok=active & ~err,
                    iters=jnp.broadcast_to(iters, (n_loc,)))
        return frames, pres, info

    spec = P("streams")
    frames_spec = dict(y=spec, u=spec, v=spec, parity=spec)
    in_specs = (spec,) * 12 + (frames_spec,)
    out_specs = (frames_spec, dict(y=spec, u=spec, v=spec),
                 dict(error=spec, ok=spec, iters=spec))
    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        **_check))


def gather_metrics(mesh: Mesh, error, iters):
    """Cross-shard metric reduction (the only ICI traffic in the decode
    path): total errored lanes and max scan iterations."""
    @functools.partial(jax.jit, out_shardings=None)
    def reduce(e, i):
        return e.sum(), i.max()
    return reduce(error, iters)


# ---------------------------------------------------------------------------
# TP: the 'space' axis -- intra-frame MB-row sharding of the dense phase
# ---------------------------------------------------------------------------

def make_space_mesh(streams: int, space: int, devices=None) -> Mesh:
    """2-D mesh (streams, space): lanes shard over 'streams' (DP),
    MB rows of each frame shard over 'space' (TP).  For the reference's
    352x192 geometry one chip per frame is plenty; the space axis is
    the scale-out story for large-frame configs where one frame's dense
    phase exceeds a chip."""
    devices = devices if devices is not None else jax.devices()
    assert streams * space <= len(devices)
    devs = np.asarray(devices[:streams * space]).reshape(streams, space)
    return Mesh(devs, axis_names=("streams", "space"))


def make_space_sharded_dense(mesh: Mesh, *, mb_width: int,
                             mb_height: int):
    """Jitted dense phase (dequant+IDCT+mocomp+compose) sharded over
    BOTH lanes ('streams') and MB rows ('space').

    Everything is shard-local except motion compensation's reference
    reads: an MB's prediction window may land anywhere within the MV
    range, so the previous frame's planes are all-gathered along
    'space' (jax.lax.all_gather, tiled) -- the one ICI collective on
    the data path.  Residuals, compose, and the frame-state update
    touch only the shard's own row band.  Bit-exact vs the unsharded
    dense_compose (tests/test_mesh.py).

    Inputs (lane-major, pre-sharded by the caller):
      coeffs3  int16[N, mbh, mbw*384]   P(streams, space)
      recs3    int32[N, mbh, mbw]       P(streams, space)
      nfinal3  int32[N, mbh, mbw*6]     P(streams, space)
      intra_q / non_intra_q [N, 64]     P(streams)
      active   bool[N]                  P(streams)
      frames   y/u/v [N, 2, H(/2), W(/2)] P(streams, None, space, None)
    Returns (frames, presented) with the same shardings.
    """
    import inspect
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    _params = inspect.signature(shard_map).parameters
    _check = {"check_vma": False} if "check_vma" in _params \
        else {"check_rep": False}

    import jax.numpy as jnp
    from jax import lax
    from espflix_tpu.models import mpeg1 as M

    n_space = mesh.shape["space"]
    assert mb_height % n_space == 0, \
        f"mb_height {mb_height} not divisible by space={n_space}"
    mbh_loc = mb_height // n_space
    mb_loc = mbh_loc * mb_width

    def body(coeffs3, recs3, nfinal3, intra_q, non_intra_q, active,
             frames):
        row0 = lax.axis_index("space") * mbh_loc
        parity = frames["parity"]
        ref_y = M._take_parity(frames["y"], 1 - parity)
        ref_u = M._take_parity(frames["u"], 1 - parity)
        ref_v = M._take_parity(frames["v"], 1 - parity)
        # the one data-path collective: full reference planes so MVs
        # can reach across shard boundaries
        rf_y = lax.all_gather(ref_y, "space", axis=1, tiled=True)
        rf_u = lax.all_gather(ref_u, "space", axis=1, tiled=True)
        rf_v = lax.all_gather(ref_v, "space", axis=1, tiled=True)
        N = recs3.shape[0]
        # row0_mb is a traced per-shard scalar; the band mocomp only
        # uses it arithmetically, so no per-shard specialization needed
        out_frames, presented = M.dense_compose(
            coeffs3.reshape(N, mb_loc * 384),
            recs3.reshape(N, mb_loc),
            nfinal3.reshape(N, mb_loc * 6),
            intra_q, non_intra_q, active, frames,
            mb_width=mb_width, mb_height=mbh_loc,
            ref_planes=(rf_y, rf_u, rf_v), row0_mb=row0)
        return out_frames, presented

    ls = P("streams")
    sp2 = P("streams", "space")
    pf = P("streams", None, "space", None)
    frames_spec = dict(y=pf, u=pf, v=pf, parity=ls)
    pres_spec = dict(y=P("streams", "space", None),
                     u=P("streams", "space", None),
                     v=P("streams", "space", None))
    in_specs = (sp2, sp2, sp2, ls, ls, ls, frames_spec)
    out_specs = (frames_spec, pres_spec)
    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        **_check))
