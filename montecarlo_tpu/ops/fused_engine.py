"""Generic fused Pallas path kernel — any scalar-state process.

Where :mod:`montecarlo_tpu.ops.gbm_kernel` is a hand-specialized GBM kernel,
this one is *process-generic*: it runs the exact same ``process.draws`` /
``process.step`` / ``process.prices`` methods the `lax.scan` engine runs —
but inside one Pallas kernel, with the whole state pytree living in
VMEM/registers for the entire time loop.  Works for every process whose
state leaves are per-path scalars (GBM, Heston, GARCH-bootstrap); the
multi-asset basket keeps the scan engine (its per-step matmul is already
MXU-fused by XLA).

Mechanics:
- the process pytree is flattened; scalar leaves ride in SMEM, array leaves
  (e.g. the GARCH shock table) in VMEM; the pytree is rebuilt inside the
  kernel so the process methods trace unmodified;
- two SDE steps run per loop iteration: both steps of a pair share one
  Threefry call (draw convention `c1 = t >> 1`), so the cipher computation
  is CSE'd — same cost model as the specialized kernel;
- draw streams are keyed by global path id -> identical to the scan engine
  and shard-invariant;
- a process declaring ``kernel_rows_field`` keeps that time-indexed table
  leaf as a Pallas REF (:class:`KernelRows`) — per-step rows read via
  dynamic `pl.dslice`, the thing Mosaic cannot express on a value (the
  exact-rows SLV leverage rides this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.ops.gbm_kernel import LANES, _block_path_ids
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic


def _tree_where(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


class KernelRows:
    """Pallas-REF view of a time-indexed (n_steps, LANES) table leaf.

    Mosaic cannot lower a dynamic slice on a VALUE, so a process whose
    step reads a per-step table row (exact-rows SLV leverage) declares
    ``kernel_rows_field = "<leaf name>"``: inside the kernel that leaf is
    handed over as this wrapper instead of a materialized array, and
    ``row(t)`` is a dynamic `pl.dslice` on the underlying ref — the same
    Mosaic-legal pattern as the bridge sampler's VMEM scratch reads.  The
    scan engine sees the plain array leaf and its `dynamic_index_in_dim`
    path; values are identical either way.
    """

    def __init__(self, ref):
        self._ref = ref

    @property
    def shape(self):
        return self._ref.shape

    def row(self, t, dtype=jnp.float32):
        k = jnp.clip(jnp.asarray(t, jnp.int32), 0, self._ref.shape[0] - 1)
        return self._ref[pl.dslice(k, 1), :][0, :].astype(dtype)


def _rows_leaf_index(tree):
    """Flatten-order index of the process's ``kernel_rows_field`` leaf
    (None when the process declares none)."""
    proc = tree if hasattr(tree, "step") else tree[0]
    field = getattr(proc, "kernel_rows_field", None)
    if field is None:
        return None
    target = getattr(proc, field)
    leaves, _ = jax.tree.flatten(tree)
    for j, leaf in enumerate(leaves):
        if leaf is target:
            return j
    return None


def _rebuild_leaves(leaf_refs, leaf_ndims, rows_idx):
    """Rebuild pytree leaves at their original ranks: scalars from SMEM,
    1-D vectors from their (1, n) VMEM row, 2-D matrices whole — except
    the (optional) kernel-rows leaf, which stays a ref behind
    :class:`KernelRows`."""
    leaves = []
    for j, (r, nd) in enumerate(zip(leaf_refs, leaf_ndims)):
        if j == rows_idx:
            leaves.append(KernelRows(r))
        elif nd == 0:
            leaves.append(r[0, 0])
        elif nd == 1:
            leaves.append(r[0, :])
        else:
            leaves.append(r[:, :])
    return leaves


def _bridge_fill_scratch(smp, scratch_ref, k0, k1, draw_ids,
                         block_rows: int):
    """Phase 1 of the scratch-cached bridge sampler: compute each of the
    sampler's T bridge normals once (one-hot direction-number reads) and
    store it at its dim's row range of the VMEM scratch."""
    def fill(d, carry):
        z = smp.z_kernel(d, k0, k1, draw_ids, jnp.float32)
        scratch_ref[pl.dslice(d * block_rows, block_rows), :] = z
        return carry

    jax.lax.fori_loop(0, smp.n_steps, fill, jnp.int32(0))


def _bridge_step_draws(smp, scratch_ref, t, block_rows: int):
    """Phase 2 step draw: combine the O(log T) cached bridge normals of
    step ``t`` (dynamic VMEM loads) with the plan weights — same padded
    slot order as the scan engine, so the sum is op-for-op identical."""
    eps = jnp.zeros((block_rows, LANES), jnp.float32)
    for j in range(smp.width):
        dim, c = smp.plan_scalars(t, j)
        zj = scratch_ref[pl.dslice(dim * block_rows, block_rows), :]
        eps = eps + c * zj
    return (eps,)


def _scratch_shapes(sampler, block_rows: int):
    """pallas_call scratch allocation for scratch-cached samplers."""
    if sampler is None or not getattr(sampler, "kernel_scratch", False):
        return []
    return [pltpu.VMEM((sampler.n_steps * block_rows, LANES), jnp.float32)]


def _make_kernel(treedef, leaf_ndims, n_steps: int, block_rows: int,
                 antithetic: bool, payoff_fn=None, has_sampler: bool = False,
                 rows_idx=None):
    def kernel(*refs):
        n_leaves = len(leaf_ndims)
        leaf_refs = refs[:n_leaves]
        scalar_ref = refs[n_leaves]
        out_ref = refs[n_leaves + 1]

        leaves = _rebuild_leaves(leaf_refs, leaf_ndims, rows_idx)
        obj = jax.tree.unflatten(treedef, leaves)
        proc, smp = obj if has_sampler else (obj, None)

        b = pl.program_id(0)
        ids = _block_path_ids(b, block_rows, scalar_ref[0, 0])
        k0 = scalar_ref[0, 1].astype(jnp.uint32)
        k1 = scalar_ref[0, 2].astype(jnp.uint32)

        if antithetic:
            # Path 2k+1 mirrors path 2k (same global pair ids as the
            # AntitheticSampler in the scan engine).
            draw_ids = ids >> jnp.uint32(1)
            odd = (ids & jnp.uint32(1)) == 1
        else:
            draw_ids = ids

        def get_draws(j):
            if smp is not None:
                # Custom sampler (device Sobol): one call per step — the
                # pair-sharing of the Threefry cipher does not apply.
                eps0 = smp.draws_kernel(proc, k0, k1, draw_ids, 2 * j,
                                        jnp.float32)
                eps1 = smp.draws_kernel(proc, k0, k1, draw_ids, 2 * j + 1,
                                        jnp.float32)
                return eps0, eps1
            eps0, eps1 = proc.draws_pair(k0, k1, draw_ids, j, jnp.float32)
            if antithetic:
                m0, m1 = proc.antithetic(eps0), proc.antithetic(eps1)
                eps0 = tuple(jnp.where(odd, m, e)
                             for m, e in zip(m0, eps0))
                eps1 = tuple(jnp.where(odd, m, e)
                             for m, e in zip(m1, eps1))
            return eps0, eps1

        state0 = proc.init_state(ids, jnp.float32)

        if smp is not None and getattr(smp, "kernel_scratch", False):
            # Scratch-cached sampler (bridge Sobol): every bridge normal
            # is computed once into VMEM scratch, then the time loop
            # combines O(log T) cached normals per step (see
            # SobolBridgeKernelSampler).
            scratch_ref = refs[n_leaves + 2]
            _bridge_fill_scratch(smp, scratch_ref, k0, k1, draw_ids,
                                 block_rows)

            def bridge_body(t, state):
                eps = _bridge_step_draws(smp, scratch_ref, t, block_rows)
                return proc.step(state, eps, t)

            final = jax.lax.fori_loop(0, n_steps, bridge_body, state0)
        else:
            def body(j, state):
                # Both steps of a pair draw from the same cipher calls —
                # draws_pair makes the sharing explicit (no reliance on
                # CSE).
                eps0, eps1 = get_draws(j)
                t0 = 2 * j
                t1 = 2 * j + 1
                if hasattr(proc, "step_pair"):
                    # Pair-fused step (e.g. GARCH shares one pass over its
                    # shock-table rows) — op-for-op identical to two steps.
                    state, stepped = proc.step_pair(state, eps0, eps1, t0)
                else:
                    state = proc.step(state, eps0, t0)
                    stepped = proc.step(state, eps1, t1)
                return _tree_where(t1 < n_steps, stepped, state)

            n_pairs = (n_steps + 1) // 2
            final = jax.lax.fori_loop(0, n_pairs, body, state0)
        prices = proc.prices(final)
        if payoff_fn is None:
            out_ref[:] = prices
        else:
            # Payoff + per-row (128-path) moments inside the kernel: the
            # HBM write shrinks from (rows, 128) prices to (rows, 2) stats —
            # the pod-scale chunking mode never materializes terminals.
            pay = payoff_fn(prices)
            mean_rows = jnp.mean(pay, axis=1, keepdims=True)
            d = pay - mean_rows
            m2_rows = jnp.sum(d * d, axis=1, keepdims=True)
            out_ref[:] = jnp.concatenate([mean_rows, m2_rows], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "block_rows", "interpret", "antithetic"))
def fused_terminal_pallas(process, n_paths: int, n_steps: int, *, seed,
                          stream=0, path_offset=0, block_rows: int = 128,
                          interpret: bool = False, antithetic: bool = False,
                          sampler=None):
    """Terminal prices for any scalar-state process via one fused kernel.

    Same draw streams as ``simulate(process, ..., mode="terminal")`` (with
    ``sampler=AntitheticSampler()`` when ``antithetic=True``); verified
    bitwise-identical to the scan engine for all five processes, both in
    interpret mode and compiled on TPU v5e, and bitwise reproducible across
    block sizes / path offsets / mesh shapes.

    ``sampler``: an in-kernel draw provider exposing ``draws_kernel`` (the
    device Sobol sampler) — its tables ride VMEM next to the process leaves.
    """
    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    num_blocks = n_paths // block
    if sampler is not None and antithetic:
        raise ValueError("antithetic composes with the default draws only")
    if sampler is not None:
        from montecarlo_tpu.engine.simulate import check_sampler

        check_sampler(sampler, process, n_steps)

    tree = (process, sampler) if sampler is not None else process
    leaf_inputs, leaf_specs, treedef, leaf_ndims = _flatten_process(tree)
    scalars = _scalar_row(seed, stream, path_offset)

    out = pl.pallas_call(
        _make_kernel(treedef, leaf_ndims, n_steps, block_rows,
                     antithetic, has_sampler=sampler is not None,
                     rows_idx=_rows_leaf_index(tree)),
        grid=(num_blocks,),
        in_specs=leaf_specs + [
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, LANES),
                                       jnp.float32),
        scratch_shapes=_scratch_shapes(sampler, block_rows),
        interpret=interpret,
    )(*leaf_inputs, scalars)
    return out.reshape(-1)


def _make_functional_kernel(treedef, leaf_ndims, n_steps: int,
                            block_rows: int, antithetic: bool,
                            functionals, has_sampler: bool = False,
                            rows_idx=None):
    """Kernel variant folding path functionals (Asian means, barrier
    running max/min, discount integrals) into the time loop: the full
    trajectory is observed on-chip, only terminals + finalized functionals
    are written to HBM — the scan engine's `simulate_functionals`
    semantics at fused-kernel throughput."""
    def kernel(*refs):
        n_leaves = len(leaf_ndims)
        leaf_refs = refs[:n_leaves]
        scalar_ref = refs[n_leaves]
        out_refs = refs[n_leaves + 1:]

        leaves = _rebuild_leaves(leaf_refs, leaf_ndims, rows_idx)
        obj = jax.tree.unflatten(treedef, leaves)
        proc, smp = obj if has_sampler else (obj, None)

        b = pl.program_id(0)
        ids = _block_path_ids(b, block_rows, scalar_ref[0, 0])
        k0 = scalar_ref[0, 1].astype(jnp.uint32)
        k1 = scalar_ref[0, 2].astype(jnp.uint32)

        if antithetic:
            draw_ids = ids >> jnp.uint32(1)
            odd = (ids & jnp.uint32(1)) == 1
        else:
            draw_ids = ids

        def get_draws(j):
            if smp is not None:
                eps0 = smp.draws_kernel(proc, k0, k1, draw_ids, 2 * j,
                                        jnp.float32)
                eps1 = smp.draws_kernel(proc, k0, k1, draw_ids, 2 * j + 1,
                                        jnp.float32)
                return eps0, eps1
            eps0, eps1 = proc.draws_pair(k0, k1, draw_ids, j, jnp.float32)
            if antithetic:
                m0, m1 = proc.antithetic(eps0), proc.antithetic(eps1)
                eps0 = tuple(jnp.where(odd, m, e)
                             for m, e in zip(m0, eps0))
                eps1 = tuple(jnp.where(odd, m, e)
                             for m, e in zip(m1, eps1))
            return eps0, eps1

        from montecarlo_tpu.engine.functionals import functional_observables

        state0 = proc.init_state(ids, jnp.float32)
        accs0 = tuple(f.init(o) for f, o in zip(
            functionals, functional_observables(proc, state0, functionals)))

        if smp is not None and getattr(smp, "kernel_scratch", False):
            # Scratch-cached sampler: same update order as the scan
            # engine (one functional update per step, after the step).
            scratch_ref = refs[len(leaf_ndims) + 1 + len(functionals) + 1]
            _bridge_fill_scratch(smp, scratch_ref, k0, k1, draw_ids,
                                 block_rows)

            def bridge_body(t, carry):
                state, accs = carry
                eps = _bridge_step_draws(smp, scratch_ref, t, block_rows)
                state = proc.step(state, eps, t)
                obs = functional_observables(proc, state, functionals)
                accs = tuple(f.update(a, o, t + 1)
                             for f, a, o in zip(functionals, accs, obs))
                return state, accs

            state, accs = jax.lax.fori_loop(0, n_steps, bridge_body,
                                            (state0, accs0))
            out_refs[0][:] = proc.prices(state)
            for k, (f, a) in enumerate(zip(functionals, accs)):
                out_refs[k + 1][:] = f.finalize(a, float(n_steps))
            return

        def body(j, carry):
            state, accs = carry
            eps0, eps1 = get_draws(j)
            t0 = 2 * j
            # Step t0 is always a real step (n_pairs = ceil(n_steps/2)).
            if hasattr(proc, "step_pair"):
                state, stepped_pair = proc.step_pair(state, eps0, eps1, t0)
            else:
                stepped_pair = None
                state = proc.step(state, eps0, t0)
            obs0 = functional_observables(proc, state, functionals)
            accs = tuple(f.update(a, o, t0 + 1)
                         for f, a, o in zip(functionals, accs, obs0))
            t1 = 2 * j + 1
            stepped = (stepped_pair if stepped_pair is not None
                       else proc.step(state, eps1, t1))
            obs1 = functional_observables(proc, stepped, functionals)
            live = t1 < n_steps
            new_accs = tuple(f.update(a, o, t1 + 1)
                             for f, a, o in zip(functionals, accs, obs1))
            accs = tuple(_tree_where(live, na, a)
                         for na, a in zip(new_accs, accs))
            return _tree_where(live, stepped, state), accs

        n_pairs = (n_steps + 1) // 2
        final, accs = jax.lax.fori_loop(0, n_pairs, body, (state0, accs0))
        out_refs[0][:] = proc.prices(final)
        for k, (f, a) in enumerate(zip(functionals, accs)):
            out_refs[k + 1][:] = f.finalize(a, float(n_steps))

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "block_rows", "interpret", "antithetic",
    "functional_items"))
def fused_functionals_pallas(process, n_paths: int, n_steps: int, *, seed,
                             functional_items, stream=0, path_offset=0,
                             block_rows: int = 128, interpret: bool = False,
                             antithetic: bool = False, sampler=None) -> dict:
    """Terminal prices plus named path functionals via one fused kernel.

    ``functional_items``: tuple of (name, PathFunctional) pairs (hashable —
    use the module-level functional constants / factories once).  Bitwise
    identical to ``engine.functionals.simulate_functionals`` (same update
    order: spot folded by init, one update per step).
    """
    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    num_blocks = n_paths // block
    if sampler is not None and antithetic:
        raise ValueError("antithetic composes with the default draws only")
    if sampler is not None:
        from montecarlo_tpu.engine.simulate import check_sampler

        check_sampler(sampler, process, n_steps)
    names = [k for k, _ in functional_items]
    fns = tuple(f for _, f in functional_items)

    tree = (process, sampler) if sampler is not None else process
    leaf_inputs, leaf_specs, treedef, leaf_ndims = _flatten_process(tree)
    scalars = _scalar_row(seed, stream, path_offset)

    n_out = 1 + len(fns)
    outs = pl.pallas_call(
        _make_functional_kernel(treedef, leaf_ndims, n_steps, block_rows,
                                antithetic, fns,
                                has_sampler=sampler is not None,
                                rows_idx=_rows_leaf_index(tree)),
        grid=(num_blocks,),
        in_specs=leaf_specs + [
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((num_blocks * block_rows, LANES),
                                        jnp.float32)] * n_out,
        scratch_shapes=_scratch_shapes(sampler, block_rows),
        interpret=interpret,
    )(*leaf_inputs, scalars)
    result = {"terminal": outs[0].reshape(-1)}
    for name, arr in zip(names, outs[1:]):
        result[name] = arr.reshape(-1)
    return result


def _flatten_process(process):
    """Flatten a process pytree into pallas inputs: scalars ride SMEM, 1-D
    and 2-D array leaves (e.g. the GARCH shock table, per-asset curve
    matrices) ride VMEM."""
    leaves, treedef = jax.tree.flatten(process)
    leaf_ndims = [jnp.ndim(l) for l in leaves]
    leaf_inputs = []
    leaf_specs = []
    for leaf, nd in zip(leaves, leaf_ndims):
        if nd == 0:
            leaf_inputs.append(jnp.reshape(leaf, (1, 1)))
            leaf_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                           memory_space=pltpu.SMEM))
        elif nd <= 2:
            arr = jnp.reshape(leaf, (1, -1)) if nd == 1 else leaf
            leaf_inputs.append(arr)
            leaf_specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                           memory_space=pltpu.VMEM))
        else:
            raise ValueError(
                "fused kernels support scalar, 1-D, and 2-D process "
                f"leaves, got shape {jnp.shape(leaf)}")
    return leaf_inputs, leaf_specs, treedef, leaf_ndims


def _scalar_row(seed, stream, path_offset):
    k0, k1 = key_from_seed_dynamic(seed, stream)
    return jnp.stack([
        jnp.asarray(path_offset).astype(jnp.int32),
        k0.astype(jnp.int32),  # bit-preserving reinterpret
        k1.astype(jnp.int32),
    ]).reshape(1, 3)


@functools.partial(jax.jit, static_argnames=(
    "payoff_fn", "n_paths", "n_steps", "block_rows", "stats_block",
    "interpret", "antithetic"))
def fused_block_moments_pallas(process, payoff_fn, n_paths: int,
                               n_steps: int, *, seed, stream=0,
                               path_offset=0, block_rows: int = 128,
                               stats_block: int = 4096,
                               interpret: bool = False,
                               antithetic: bool = False, sampler=None):
    """Per-block payoff moments with the terminal array never leaving VMEM.

    The kernel applies ``payoff_fn`` to the terminal prices and writes one
    (mean, m2) pair per 128-path row — a 64x smaller HBM write than the
    terminal array (TODO perf item 1: at pod-scale chunk counts the terminal
    write is pure overhead).  Rows are then tree-merged into the standard
    fixed ``stats_block``-path block states.

    Returns a :class:`MomentState` with leaves shaped
    ``(n_paths // stats_block,)`` — same block contract as
    ``parallel.sharded.block_moments`` (fixed block size, global-id-aligned,
    mesh-shape invariant), but the in-kernel row reduction uses its own
    (deterministic) float ordering, so values differ from the materializing
    path by float round-off, never statistically.
    """
    from montecarlo_tpu.stats.welford import MomentState, moments_merge

    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    if stats_block % LANES != 0 or block % stats_block != 0:
        raise ValueError(
            f"stats_block={stats_block} must divide the kernel block {block} "
            f"and be a multiple of {LANES}")
    num_blocks = n_paths // block
    rows_per_stat = stats_block // LANES
    if sampler is not None and antithetic:
        raise ValueError("antithetic composes with the default draws only")
    if sampler is not None:
        from montecarlo_tpu.engine.simulate import check_sampler

        check_sampler(sampler, process, n_steps)

    tree = (process, sampler) if sampler is not None else process
    leaf_inputs, leaf_specs, treedef, leaf_ndims = _flatten_process(tree)
    scalars = _scalar_row(seed, stream, path_offset)

    rows = pl.pallas_call(
        _make_kernel(treedef, leaf_ndims, n_steps, block_rows,
                     antithetic, payoff_fn=payoff_fn,
                     has_sampler=sampler is not None,
                     rows_idx=_rows_leaf_index(tree)),
        grid=(num_blocks,),
        in_specs=leaf_specs + [
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_rows, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, 2),
                                       jnp.float32),
        scratch_shapes=_scratch_shapes(sampler, block_rows),
        interpret=interpret,
    )(*leaf_inputs, scalars)

    # Tree-merge the per-row states into fixed 4096-path blocks (a fixed
    # inner pairwise tree over the global-id-ordered rows — shard-invariant).
    n_stat = n_paths // stats_block
    mean = rows[:, 0].reshape(n_stat, rows_per_stat)
    m2 = rows[:, 1].reshape(n_stat, rows_per_stat)
    count = jnp.full((n_stat, rows_per_stat), jnp.float32(LANES))
    states = MomentState(count=count, mean=mean, m2=m2)
    k = rows_per_stat
    while k > 1:
        half = k // 2
        a = jax.tree.map(lambda v: v[:, 0:2 * half:2], states)
        b = jax.tree.map(lambda v: v[:, 1:2 * half:2], states)
        merged = moments_merge(a, b)
        if k % 2:
            merged = jax.tree.map(
                lambda m, v: jnp.concatenate([m, v[:, 2 * half:]], axis=1),
                merged, states)
        states = merged
        k = states.count.shape[1]
    return MomentState(count=states.count[:, 0], mean=states.mean[:, 0],
                       m2=states.m2[:, 0])
