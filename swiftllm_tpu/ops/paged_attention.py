"""Ragged paged attention — Pallas TPU kernels.

Replaces both of the reference's attention paths — the varlen causal prefill
flash attention (swiftllm/worker/kernels/prefill_attn.py, and its
vllm_flash_attn stand-in, transformer_layer.py:86-96) and the two-phase
flash-decoding paged attention (swiftllm/worker/kernels/paged_attn.py:10-149)
— which is what lets the scheduler put prefill chunks and decode tokens in the
same step.

Contract (identical to models.llama._ragged_paged_attention_jnp): batch row b
has q_lens[b] query tokens, contiguous in the flat token stream starting at
q_starts[b]; they are the LAST q_lens[b] positions of a sequence whose total
KV length (after this step's cache writes) is seq_lens[b], with KV living in
pages page_table[b]. Causal within the tail: query i of row b has position
seq_lens[b] - q_lens[b] + i.

Two variants share the KV-streaming core (per-page async copies HBM→VMEM,
double-buffered across KV chunks; online softmax in fp32; one
[rows, hd] x [hd, chunk] MXU matmul per q head):

- **decode** (q_bucket == 1): the builder packs decode tokens so flat index ==
  row index; q/o ride ordinary BlockSpecs of ROW_TILE rows per grid step and
  the kernel walks the rows, each with its own KV stream.
- **mixed/prefill** (q_bucket > 1): grid (B, q_tiles); each tile DMAs its q
  rows from HBM at a dynamic offset. The builder aligns every sequence's span
  to the (>=16-row) tile so offsets are provably tile-aligned — Mosaic rejects
  unaligned or single-row dynamic slices.

Mosaic layout rules this design honors (learned the hard way):
- memrefs are lane-tiled (last dim padded to 128): DMA-sliced arrays are
  passed as 2-D views with 128-aligned minor dims ([T, n_q*hd],
  [S, 2*n_kv*hd]); heads are extracted with lane slices on VMEM values (no
  lane-splitting reshapes, which fail for hd < 128).
- dynamic row-slices must be sublane-tile aligned (8 f32 / 16 bf16); BlockSpec
  blocks need >=8 sublanes or the full array dim.
- The reference's seq_block_size SM-occupancy heuristic (model.py:305-324) has
  no TPU analog: one core walks chunks sequentially, sized by a VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swiftllm_tpu.utils import cdiv, next_power_of_2
from swiftllm_tpu.worker.batch_builder import tile_q_for

NEG_INF = -1e30
DECODE_ROW_TILE = 16


def _make_chunk_io(cache_hbm, page_table_ref, kv_buf, kv_sems, *,
                   page_size: int, chunk_pages: int):
    """Per-page async-copy helpers for one row's KV chunks."""

    def start_chunk(b, c, slot):
        base = c * chunk_pages
        for j in range(chunk_pages):
            page = page_table_ref[b, base + j]
            pltpu.make_async_copy(
                cache_hbm.at[pl.ds(page * page_size, page_size)],
                kv_buf.at[slot, j],
                kv_sems.at[slot, j],
            ).start()

    def wait_chunk(slot):
        for j in range(chunk_pages):
            # Reconstruct an equivalent copy to wait on its semaphore.
            pltpu.make_async_copy(
                cache_hbm.at[pl.ds(0, page_size)],  # shape-only
                kv_buf.at[slot, j],
                kv_sems.at[slot, j],
            ).wait()

    return start_chunk, wait_chunk


def _flash_inner(q2, kv_buf, start_next, wait_chunk, *, num_chunks, q_pos,
                 seq_len, chunk, n_q, n_kv, hd, sm_scale):
    """Online-softmax flash attention over KV chunks for one tile of queries.

    q2: [rows, n_q*hd] VMEM value. Returns a list of [rows, hd] f32 per q head.
    """
    group = n_q // n_kv
    rows = q2.shape[0]
    m0 = jnp.full((n_q, rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((n_q, rows, 1), jnp.float32)
    a0 = jnp.zeros((n_q, rows, hd), jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            start_next(c + 1, jax.lax.rem(c + 1, 2))

        wait_chunk(slot)
        kv2 = kv_buf[slot].reshape(chunk, 2 * n_kv * hd)
        key_pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        valid = (key_pos <= q_pos) & (key_pos < seq_len)   # [rows, chunk]

        new_m, new_l, new_acc = [], [], []
        for i in range(n_q):
            h = i // group
            qi = q2[:, i * hd:(i + 1) * hd]                 # [rows, hd]
            kh = kv2[:, h * hd:(h + 1) * hd]                # [chunk, hd]
            vh = kv2[:, (n_kv + h) * hd:(n_kv + h + 1) * hd]
            s = jax.lax.dot_general(
                qi.astype(kh.dtype), kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(valid, s, NEG_INF)

            mi = jnp.maximum(m[i], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - mi)
            scale = jnp.exp(m[i] - mi)
            li = l[i] * scale + jnp.sum(p, axis=-1, keepdims=True)
            ai = acc[i] * scale + jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            new_m.append(mi)
            new_l.append(li)
            new_acc.append(ai)
        return (jnp.stack(new_m), jnp.stack(new_l), jnp.stack(new_acc))

    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, a0))
    return [acc[i] / jnp.maximum(l[i], 1e-30) for i in range(n_q)]


def _decode_kernel(
    q_starts_ref, q_lens_ref, seq_lens_ref, page_table_ref,
    q_ref,          # VMEM block [row_tile, n_q*hd] (rows g*R .. g*R+R-1)
    cache_hbm,      # [S, 2*n_kv*hd]
    o_ref,          # VMEM block [row_tile, n_q*hd]
    kv_buf, kv_sems,
    *, page_size, chunk_pages, sm_scale, n_q, n_kv, hd, row_tile,
):
    g = pl.program_id(0)
    chunk = chunk_pages * page_size
    start_chunk, wait_chunk = _make_chunk_io(
        cache_hbm, page_table_ref, kv_buf, kv_sems,
        page_size=page_size, chunk_pages=chunk_pages)

    for r in range(row_tile):
        b = g * row_tile + r
        seq_len = seq_lens_ref[b]

        @pl.when((q_lens_ref[b] > 0) & (seq_len > 0))
        def _row(r=r, b=b, seq_len=seq_len):
            start_chunk(b, 0, 0)
            num_chunks = pl.cdiv(seq_len, chunk)
            q2 = q_ref[r:r + 1, :]                          # [1, n_q*hd]
            q_pos = jnp.full((1, 1), seq_len - 1, jnp.int32)
            outs = _flash_inner(
                q2, kv_buf, functools.partial(start_chunk, b), wait_chunk,
                num_chunks=num_chunks, q_pos=q_pos, seq_len=seq_len,
                chunk=chunk, n_q=n_q, n_kv=n_kv, hd=hd, sm_scale=sm_scale)
            for i in range(n_q):
                o_ref[r:r + 1, i * hd:(i + 1) * hd] = outs[i].astype(o_ref.dtype)


def _tiles_kernel(
    q_starts_ref, q_lens_ref, seq_lens_ref, page_table_ref,
    q_hbm,          # [T, n_q*hd]
    cache_hbm,      # [S, 2*n_kv*hd]
    o_hbm,          # [T, n_q*hd]
    q_buf, kv_buf, o_buf, q_sem, kv_sems, o_sem,
    *, page_size, tile_q, chunk_pages, sm_scale, n_q, n_kv, hd,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    chunk = chunk_pages * page_size
    q_len = q_lens_ref[b]
    seq_len = seq_lens_ref[b]
    q_start = q_starts_ref[b]
    start_chunk, wait_chunk = _make_chunk_io(
        cache_hbm, page_table_ref, kv_buf, kv_sems,
        page_size=page_size, chunk_pages=chunk_pages)

    @pl.when((q_len > t * tile_q) & (seq_len > 0))
    def _run():
        # Spans are tile-aligned by the builder, so this offset is aligned.
        tile_start = pl.multiple_of(q_start + t * tile_q, tile_q)
        q_dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(tile_start, tile_q)], q_buf, q_sem)
        q_dma.start()

        # Causal upper bound on the KV this tile can see.
        kv_needed = jnp.minimum(seq_len, seq_len - q_len + (t + 1) * tile_q)
        num_chunks = pl.cdiv(kv_needed, chunk)

        start_chunk(b, 0, 0)
        q_dma.wait()
        q2 = q_buf[:]                                       # [tile_q, n_q*hd]
        q_pos = (seq_len - q_len + t * tile_q
                 + jax.lax.broadcasted_iota(jnp.int32, (tile_q, 1), 0))

        outs = _flash_inner(
            q2, kv_buf, functools.partial(start_chunk, b), wait_chunk,
            num_chunks=num_chunks, q_pos=q_pos, seq_len=seq_len,
            chunk=chunk, n_q=n_q, n_kv=n_kv, hd=hd, sm_scale=sm_scale)
        for i in range(n_q):
            o_buf[:, i * hd:(i + 1) * hd] = outs[i].astype(o_buf.dtype)
        o_dma = pltpu.make_async_copy(
            o_buf, o_hbm.at[pl.ds(tile_start, tile_q)], o_sem)
        o_dma.start()
        o_dma.wait()


def _chunk_geometry(Pg, page_size, n_kv, hd, itemsize, max_chunk_pages):
    """KV chunk sizing. Measured on v5e (SURVEY sweep 2026-08-16): ~512KB per
    buffer with double-buffering reaches streaming peak; full-context chunks
    serialize DMA behind compute and crater to <10% of peak."""
    buf_budget = 512 * 1024
    max_chunk_tokens = max(page_size, buf_budget // (2 * n_kv * hd * itemsize))
    chunk_pages = max(1, min(Pg, next_power_of_2(max_chunk_tokens // page_size + 1) // 2))
    if max_chunk_pages is not None:
        chunk_pages = min(chunk_pages, max_chunk_pages)
    return chunk_pages, cdiv(Pg, chunk_pages)


def ragged_paged_attention(q, cache, layer, batch, *, page_size: int,
                           sm_scale: float, q_bucket: int,
                           interpret: bool = False,
                           max_chunk_pages: int | None = None) -> jax.Array:
    """q: [T, n_q, hd]; cache: [L, S, 2, n_kv, hd] (FULL cache — the kernel
    offsets pages by `layer`, a traced scalar, so XLA never materializes a
    per-layer slice). Returns [T, n_q, hd]."""
    T, n_q, hd = q.shape
    B, Pg = batch.page_table.shape
    L, S = cache.shape[0], cache.shape[1]
    n_kv = cache.shape[3]
    assert (n_q * hd) % 128 == 0, f"n_q*hd={n_q*hd} must be 128-aligned"
    assert (2 * n_kv * hd) % 128 == 0, f"2*n_kv*hd={2*n_kv*hd} must be 128-aligned"

    itemsize = jnp.dtype(cache.dtype).itemsize
    chunk_pages, max_chunks = _chunk_geometry(
        Pg, page_size, n_kv, hd, itemsize, max_chunk_pages)
    # Shift page ids into the layer's slot range of the flat [L*S] cache view,
    # and pad so chunk reads never index out of bounds.
    pt = batch.page_table + layer.astype(jnp.int32) * (S // page_size)
    pad_pages = chunk_pages * max_chunks - Pg
    if pad_pages:
        pt = jnp.pad(pt, ((0, 0), (0, pad_pages)))

    tile_q = tile_q_for(q_bucket)
    scalars = (batch.q_starts, batch.q_lens, batch.seq_lens, pt)

    if tile_q == 1:
        # Decode: the builder packs decode tokens so flat index == row index.
        assert T >= B, f"decode path needs T({T}) >= B({B})"
        row_tile = min(DECODE_ROW_TILE, B)
        assert B % row_tile == 0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B // row_tile,),
            in_specs=[
                pl.BlockSpec((row_tile, n_q * hd), lambda g, *refs: (g, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),   # cache
            ],
            out_specs=pl.BlockSpec((row_tile, n_q * hd), lambda g, *refs: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_pages, page_size, 2 * n_kv * hd), cache.dtype),
                pltpu.SemaphoreType.DMA((2, chunk_pages)),
            ],
        )
        kernel = functools.partial(
            _decode_kernel, page_size=page_size, chunk_pages=chunk_pages,
            sm_scale=sm_scale, n_q=n_q, n_kv=n_kv, hd=hd, row_tile=row_tile)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, n_q * hd), q.dtype),
            interpret=interpret,
        )(*scalars, q.reshape(T, n_q * hd)[:B],
          cache.reshape(L * S, 2 * n_kv * hd))
        if T > B:
            out = jnp.pad(out, ((0, T - B), (0, 0)))
        return out.reshape(T, n_q, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, cdiv(q_bucket, tile_q)),
        in_specs=[
            # Explicit HBM: with pl.ANY the compiler may promote small arrays
            # to VMEM, where unaligned slices are illegal.
            pl.BlockSpec(memory_space=pltpu.HBM),   # q
            pl.BlockSpec(memory_space=pltpu.HBM),   # cache
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((tile_q, n_q * hd), q.dtype),                        # q_buf
            pltpu.VMEM((2, chunk_pages, page_size, 2 * n_kv * hd), cache.dtype),
            pltpu.VMEM((tile_q, n_q * hd), q.dtype),                        # o_buf
            pltpu.SemaphoreType.DMA,                                        # q_sem
            pltpu.SemaphoreType.DMA((2, chunk_pages)),                      # kv_sems
            pltpu.SemaphoreType.DMA,                                        # o_sem
        ],
    )
    kernel = functools.partial(
        _tiles_kernel, page_size=page_size, tile_q=tile_q,
        chunk_pages=chunk_pages, sm_scale=sm_scale, n_q=n_q, n_kv=n_kv, hd=hd)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, n_q * hd), q.dtype),
        interpret=interpret,
    )(*scalars, q.reshape(T, n_q * hd), cache.reshape(L * S, 2 * n_kv * hd))
    return out.reshape(T, n_q, hd)
