"""Pallas ragged-paged-attention kernel vs the pure-jnp reference. Same
pattern as the reference's commented-out naive impls (paged_attn.py:224-259),
but checked in and executed.

Runs in interpret mode on the CPU backend (CI), and with REAL Mosaic-compiled
kernels when the session's backend is a TPU: ``SWIFTLLM_KEEP_PLATFORM=1
pytest tests/test_paged_attention.py`` on a TPU machine executes the same
case matrix on-chip (bench.py --selftest records an artifact of that run)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

ON_TPU = jax.devices()[0].platform != "cpu"
INTERPRET = not ON_TPU
# TPU f32 matmuls run at reduced (bf16-pass) precision by default; the kernel
# and the jnp reference round differently, so on-chip parity is looser.
ATOL = 2e-5 if INTERPRET else 2e-2

from swiftllm_tpu.models.llama import StepBatch, _ragged_paged_attention_jnp
from swiftllm_tpu.ops.paged_attention import ragged_paged_attention
from swiftllm_tpu.utils import cdiv, next_power_of_2
from swiftllm_tpu.worker.batch_builder import tile_q_for


def make_case(rng, seq_specs, *, n_q=4, n_kv=2, hd=32, page_size=8, Pg=8,
              T=None, B=None, q_bucket=None, dtype=jnp.float32,
              contig=False):
    """seq_specs: list of (q_len, seq_len). Builds a random cache + flat q with
    tile-aligned spans, mirroring batch_builder layout."""
    n = len(seq_specs)
    q_bucket = q_bucket or next_power_of_2(max(q for q, _ in seq_specs))
    align = tile_q_for(q_bucket)
    B = B or next_power_of_2(n)
    T = T or max(next_power_of_2(sum(cdiv(q, align) * align for q, _ in seq_specs)), align)

    num_pages = B * Pg
    S = (num_pages + 1) * page_size
    cache = rng.normal(size=(S, 2, n_kv, hd)).astype(dtype)
    q = rng.normal(size=(T, n_q, hd)).astype(dtype)

    q_starts = np.full(B, T, np.int32)
    q_lens = np.zeros(B, np.int32)
    seq_lens = np.zeros(B, np.int32)
    page_table = np.zeros((B, Pg), np.int32)
    positions = np.zeros(T, np.int32)

    # non-overlapping page assignment: random permutation exercises the
    # per-page DMA path; contig=True gives every row CONSECUTIVE pool pages,
    # exercising the coalesced fast paths (sel = pow2 whole-history DMA and
    # sel = -1 full-chunk DMAs — a fresh allocator's common case).
    perm = np.arange(num_pages) if contig else rng.permutation(num_pages)
    cursor, page_cursor = 0, 0
    for b, (q_len, seq_len) in enumerate(seq_specs):
        assert q_len <= seq_len
        npages = cdiv(seq_len, page_size)
        page_table[b, :npages] = perm[page_cursor:page_cursor + npages]
        page_cursor += npages
        q_starts[b] = cursor
        q_lens[b] = q_len
        seq_lens[b] = seq_len
        positions[cursor:cursor + q_len] = np.arange(seq_len - q_len, seq_len)
        cursor += cdiv(q_len, align) * align
    assert cursor <= T

    # Decode rows: the fused kernel reads the new token's K/V from kv_new and
    # writes it to kv_slots; point both at the sequence's actual last slot so
    # the write is a no-op and the math matches the pure-cache reference.
    kv_slots = np.zeros(T, np.int32)
    for b, (q_len, seq_len) in enumerate(seq_specs):
        last = seq_len - 1
        kv_slots[b] = page_table[b, last // page_size] * page_size + last % page_size

    batch = StepBatch(
        token_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.asarray(positions),
        kv_slots=jnp.asarray(kv_slots),
        q_starts=jnp.asarray(q_starts),
        q_lens=jnp.asarray(q_lens),
        seq_lens=jnp.asarray(seq_lens),
        page_table=jnp.asarray(page_table),
        sample_mask=jnp.zeros(B, bool),
    )
    return jnp.asarray(q), jnp.asarray(cache), batch, q_bucket


def compare(q, cache, batch, q_bucket, atol=None, max_chunk_pages=None,
            staged_pt=None, window=0):
    atol = atol if atol is not None else ATOL
    ref = _ragged_paged_attention_jnp(q, cache, batch, page_size=8,
                                      sm_scale=0.125, q_bucket=q_bucket,
                                      window=window)
    # The kernel takes the FULL [L, S, ...] cache plus a layer index; exercise
    # a non-zero layer to cover the slot-offset arithmetic.
    stacked = jnp.stack([jnp.zeros_like(cache), cache, jnp.ones_like(cache)])
    S, _, n_kv, hd = cache.shape
    cache3 = stacked.reshape(3, S, 2 * n_kv * hd)
    if q_bucket == 1:
        # Fused store path: kv_new = the last position's actual K/V (layer 1).
        kv_new = cache3[1][np.asarray(batch.kv_slots)]     # [T, n_kv*2*hd]
        got, cache_out = ragged_paged_attention(
            q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
            sm_scale=0.125, q_bucket=q_bucket, kv_new=kv_new,
            interpret=INTERPRET, max_chunk_pages=max_chunk_pages,
            staged_pt=staged_pt, window=window)
        # The write must be a no-op here (same data back to the same slots).
        np.testing.assert_array_equal(np.asarray(cache_out), np.asarray(cache3))
    else:
        got = ragged_paged_attention(
            q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
            sm_scale=0.125, q_bucket=q_bucket,
            interpret=INTERPRET, max_chunk_pages=max_chunk_pages,
            staged_pt=staged_pt, window=window)
    # Only compare real token rows; pad rows are unspecified by contract.
    q_starts = np.asarray(batch.q_starts)
    q_lens = np.asarray(batch.q_lens)
    for b in range(len(q_lens)):
        if q_lens[b] == 0:
            continue
        sl = slice(int(q_starts[b]), int(q_starts[b] + q_lens[b]))
        np.testing.assert_allclose(np.asarray(got[sl]), np.asarray(ref[sl]),
                                   atol=atol, rtol=1e-4,
                                   err_msg=f"row {b} (q_len={q_lens[b]})")


def test_decode_only():
    rng = np.random.default_rng(0)
    case = make_case(rng, [(1, 1), (1, 9), (1, 17), (1, 64), (1, 23)])
    compare(*case)


def test_single_prefill():
    rng = np.random.default_rng(1)
    case = make_case(rng, [(12, 12)])
    compare(*case)


def test_chunked_prefill_tail():
    # query chunk is the tail of a longer cached sequence
    rng = np.random.default_rng(2)
    case = make_case(rng, [(8, 40), (4, 61)])
    compare(*case)


def test_mixed_batch():
    rng = np.random.default_rng(3)
    case = make_case(rng, [(1, 33), (16, 16), (1, 7), (5, 29), (1, 64), (1, 1)])
    compare(*case)


def test_multi_chunk_long_context():
    # force several KV chunks (Pg*page_size well beyond one chunk)
    rng = np.random.default_rng(4)
    case = make_case(rng, [(1, 512), (1, 300)], Pg=64, page_size=8)
    compare(*case, max_chunk_pages=8)   # force 8 chunks of 64 tokens


def test_gqa_groups():
    rng = np.random.default_rng(5)
    case = make_case(rng, [(7, 31), (1, 50)], n_q=8, n_kv=2)
    compare(*case)


def test_mha_no_gqa():
    rng = np.random.default_rng(6)
    case = make_case(rng, [(3, 11), (1, 26)], n_q=4, n_kv=4)
    compare(*case)


def test_large_tile_partial():
    # q_len not a multiple of the tile; tile partially filled
    rng = np.random.default_rng(7)
    case = make_case(rng, [(130, 130), (1, 40)], Pg=32, q_bucket=256)
    compare(*case)


def test_fused_span_prefill():
    """q_bucket > 128 makes the tile kernel fuse up to 4 builder tiles per
    grid step (span-grouped KV streaming); rows deliberately NOT span-aligned
    so the overshoot-padded q/o path and cross-row masking are exercised."""
    rng = np.random.default_rng(22)
    case = make_case(rng, [(300, 300), (130, 200), (40, 41)],
                     Pg=64, page_size=8, q_bucket=512)
    compare(*case, max_chunk_pages=8)


def test_fused_span_long_history():
    # One row, several KV chunks per span, span partially filled.
    rng = np.random.default_rng(23)
    case = make_case(rng, [(200, 500)], Pg=64, page_size=8, q_bucket=256)
    compare(*case, max_chunk_pages=4)


def test_staged_page_table_decode():
    """HBM-staged page-table path (contexts beyond the SMEM scalar-prefetch
    budget): decode kernel stages each group's page lists into SMEM scratch.
    Forced on small shapes here; on the real chip the long-context bench
    (b1/c131072) exercises it at production size."""
    rng = np.random.default_rng(20)
    case = make_case(rng, [(1, 512), (1, 300), (1, 64), (1, 9), (1, 1)],
                     Pg=64, page_size=8)
    compare(*case, max_chunk_pages=8, staged_pt=True)


def test_staged_page_table_prefill_mixed():
    rng = np.random.default_rng(21)
    case = make_case(rng, [(8, 200), (1, 77), (16, 16)], Pg=32, page_size=8)
    compare(*case, max_chunk_pages=4, staged_pt=True)


def test_contiguous_decode_multichunk():
    # Consecutive pool pages + histories spanning several chunks: the sel=-1
    # full-chunk DMA path, incl. an exact chunk boundary (64 = 4 full chunks
    # of 2 pages at max_chunk_pages=2) and ragged tails.
    rng = np.random.default_rng(30)
    case = make_case(rng, [(1, 64), (1, 57), (1, 15), (1, 3)], Pg=8,
                     contig=True)
    compare(*case, max_chunk_pages=2)


def test_contiguous_prefill_multichunk():
    # Prefill spans over consecutive pages: full-chunk DMAs per causal chunk,
    # plus a single-chunk row (pow2 whole-history DMA) in the same batch.
    rng = np.random.default_rng(31)
    case = make_case(rng, [(16, 200), (8, 64), (16, 16)], Pg=32,
                     page_size=8, contig=True)
    compare(*case, max_chunk_pages=4)


def test_contiguous_vs_scattered_same_result():
    # The same logical case through the per-page and coalesced paths.
    specs = [(1, 40), (1, 9)]
    for contig in (False, True):
        rng = np.random.default_rng(32)
        case = make_case(rng, specs, Pg=8, contig=contig)
        compare(*case, max_chunk_pages=2)


def compare_fused_write(rng, seq_specs, *, n_q=4, n_kv=2, hd=32, page_size=8,
                        Pg=8, q_bucket=None, contig=False,
                        max_chunk_pages=None, window=0):
    """Tile kernel with the FUSED span-KV write (kv_new given, q_bucket > 1):
    the kernel must (a) write each span's kv_new rows into the row's pages
    exactly as the XLA scatter would, and (b) attend over the updated cache.
    Contract: every span start (seq_len - q_len) is page-aligned."""
    for q_len, seq_len in seq_specs:
        assert (seq_len - q_len) % page_size == 0, "test spec must be aligned"
    q, cache, batch, q_bucket = make_case(
        rng, seq_specs, n_q=n_q, n_kv=n_kv, hd=hd, page_size=page_size,
        Pg=Pg, q_bucket=q_bucket, contig=contig)
    assert q_bucket % page_size == 0, "pick q_bucket a page multiple"
    T = q.shape[0]
    S = cache.shape[0]
    W = 2 * n_kv * hd
    kv_new = rng.normal(size=(T, W)).astype(np.float32)

    # Expected: scatter-then-attend (exactly what the unfused path does).
    pt = np.asarray(batch.page_table)
    q_starts = np.asarray(batch.q_starts)
    cache_ref = np.array(cache)                       # [S, 2, n_kv, hd]
    for b, (q_len, seq_len) in enumerate(seq_specs):
        for i in range(q_len):
            pos = seq_len - q_len + i
            slot = pt[b, pos // page_size] * page_size + pos % page_size
            cache_ref[slot] = kv_new[q_starts[b] + i].reshape(2, n_kv, hd)
    ref = _ragged_paged_attention_jnp(q, jnp.asarray(cache_ref), batch,
                                      page_size=page_size, sm_scale=0.125,
                                      q_bucket=q_bucket, window=window)

    stacked = jnp.stack([jnp.zeros_like(jnp.asarray(cache)),
                         jnp.asarray(cache),
                         jnp.ones_like(jnp.asarray(cache))])
    cache3 = stacked.reshape(3, S, W)
    got, cache_out = ragged_paged_attention(
        q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=page_size,
        sm_scale=0.125, q_bucket=q_bucket, kv_new=jnp.asarray(kv_new),
        interpret=INTERPRET, max_chunk_pages=max_chunk_pages, window=window)
    # (a) the cache update matches the scatter exactly (same dtype bytes),
    #     and other layers are untouched.
    np.testing.assert_array_equal(np.asarray(cache_out[1]),
                                  cache_ref.reshape(S, W))
    np.testing.assert_array_equal(np.asarray(cache_out[0]),
                                  np.zeros((S, W), cache_ref.dtype))
    # (b) attention parity over real token rows.
    q_lens = np.asarray(batch.q_lens)
    for b in range(len(q_lens)):
        if q_lens[b] == 0:
            continue
        sl = slice(int(q_starts[b]), int(q_starts[b] + q_lens[b]))
        np.testing.assert_allclose(np.asarray(got[sl]), np.asarray(ref[sl]),
                                   atol=ATOL, rtol=1e-4,
                                   err_msg=f"row {b} (q_len={q_lens[b]})")


def test_fused_kv_write_full_pages():
    # spans covering whole pages only: the direct kvn→cache page DMAs.
    rng = np.random.default_rng(40)
    compare_fused_write(rng, [(16, 16), (8, 40)])


def test_fused_kv_write_ragged_tail():
    # spans ending mid-page: the read-modify-write tail path.
    rng = np.random.default_rng(41)
    compare_fused_write(rng, [(12, 12), (5, 21), (9, 33)])


def test_fused_kv_write_multi_tile_span():
    # one long prefill crossing several grid tiles, ragged final page.
    rng = np.random.default_rng(42)
    compare_fused_write(rng, [(200, 200), (30, 62)], Pg=32, q_bucket=256,
                        max_chunk_pages=4)


def test_fused_kv_write_chunked_tail_contig():
    # chunk of a longer sequence (aligned start) + contiguous pool pages
    # (coalesced chunk DMAsinteroperate with the fused write).
    rng = np.random.default_rng(43)
    compare_fused_write(rng, [(16, 48), (8, 72)], Pg=16, contig=True,
                        max_chunk_pages=2)


def test_subchunk_split_parity(monkeypatch):
    # The tile kernel computes big KV chunks in TWO chained sub-chunks to
    # bound scoped-VMEM (normally only at chunk >= 1024 tokens); force the
    # split on tiny shapes and check parity, incl. an odd causal boundary.
    monkeypatch.setenv("SWIFTLLM_TILE_SUBSPLIT", "1")
    rng = np.random.default_rng(44)
    case = make_case(rng, [(8, 40), (16, 16), (5, 29)], Pg=16)
    compare(*case, max_chunk_pages=4)
    rng = np.random.default_rng(45)
    compare_fused_write(rng, [(16, 48), (9, 17)], Pg=16, max_chunk_pages=4)


def test_fp8_cache_decode():
    # Kernel handles an fp8 cache: upcasts K/V to the query dtype internally.
    rng = np.random.default_rng(8)
    q, cache, batch, qb = make_case(rng, [(1, 9), (1, 33), (1, 64)])
    cache_q = jnp.asarray(cache).astype(jnp.float8_e4m3fn)
    ref = _ragged_paged_attention_jnp(q, cache_q, batch, page_size=8,
                                      sm_scale=0.125, q_bucket=qb)
    S, n_kv, _, hd = cache.shape
    stacked = jnp.stack([jnp.zeros_like(cache_q), cache_q,
                         jnp.zeros_like(cache_q)])
    cache3 = stacked.reshape(3, S, n_kv * 2 * hd)
    kv_new = cache3[1][np.asarray(batch.kv_slots)]
    got, cache_out = ragged_paged_attention(
        q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
        sm_scale=0.125, q_bucket=qb, kv_new=kv_new, interpret=INTERPRET)
    assert cache_out.dtype == jnp.float8_e4m3fn
    for b in range(len(np.asarray(batch.q_lens))):
        if batch.q_lens[b] == 0:
            continue
        sl = slice(int(batch.q_starts[b]), int(batch.q_starts[b] + batch.q_lens[b]))
        np.testing.assert_allclose(np.asarray(got[sl]), np.asarray(ref[sl]),
                                   atol=max(ATOL, 5e-4), rtol=1e-2)


def test_decode_contiguous_pages_fast_path():
    # Consecutive page ids trigger the single-DMA fast path (sel > 0).
    rng = np.random.default_rng(9)
    q, cache, batch, qb = make_case(rng, [(1, 9), (1, 33), (1, 17)])
    B, Pg = np.asarray(batch.page_table).shape
    pt = np.zeros((B, Pg), np.int32)
    kv_slots = np.asarray(batch.kv_slots).copy()
    c = 0
    for b in range(B):
        seq_len = int(batch.seq_lens[b])
        if seq_len == 0:
            continue
        npg = cdiv(seq_len, 8)
        pt[b, :npg] = np.arange(c, c + npg)   # contiguous!
        c += npg
        last = seq_len - 1
        kv_slots[b] = pt[b, last // 8] * 8 + last % 8
    # rebuild the cache gather association: move KV into the new pages
    old_pt = np.asarray(batch.page_table)
    new_cache = np.array(cache)
    for b in range(B):
        seq_len = int(batch.seq_lens[b])
        npg = cdiv(seq_len, 8)
        for j in range(npg):
            new_cache[pt[b, j] * 8:(pt[b, j] + 1) * 8] = \
                np.asarray(cache)[old_pt[b, j] * 8:(old_pt[b, j] + 1) * 8]
    import dataclasses
    batch = dataclasses.replace(batch, page_table=jnp.asarray(pt),
                                kv_slots=jnp.asarray(kv_slots))
    compare(q, jnp.asarray(new_cache), batch, qb)


def _to_scaled_fp8(cache):
    """[S, 2, n_kv, hd] f32 → (stored [S, 2*KH+128] fp8 with per-token
    power-of-2 scale lanes, dequantized float view [S, 2, n_kv, hd])."""
    import ml_dtypes
    S, _, n_kv, hd = cache.shape
    KH = n_kv * hd
    k = np.asarray(cache)[:, 0].reshape(S, KH)
    v = np.asarray(cache)[:, 1].reshape(S, KH)

    def pw2(m):
        e = np.floor(np.log2(224.0 / np.maximum(m, 1e-20)))
        return np.exp2(np.clip(e, -6, 8)).astype(np.float32)

    ks = pw2(np.abs(k).max(1, keepdims=True))
    vs = pw2(np.abs(v).max(1, keepdims=True))
    sl = np.zeros((S, 128), np.float32)
    sl[:, 0] = ks[:, 0]
    sl[:, 1] = vs[:, 0]
    stored = np.concatenate([k * ks, v * vs, sl], 1).astype(
        ml_dtypes.float8_e4m3fn)
    st = stored.astype(np.float32)
    deq = np.stack([st[:, :KH] / np.maximum(st[:, 2 * KH:2 * KH + 1], 1e-20),
                    st[:, KH:2 * KH] / np.maximum(st[:, 2 * KH + 1:2 * KH + 2],
                                                  1e-20)],
                   axis=1).reshape(S, 2, n_kv, hd)
    return stored, deq


@pytest.mark.parametrize("seq_specs", [
    [(1, 9), (1, 33), (1, 64), (1, 1)],          # decode (fused-store path)
    [(5, 29), (1, 17)],                           # mixed tile path
])
def test_fp8_per_token_scales(seq_specs):
    """Kernels must consume the fp8 cache WITH inline per-token scale lanes
    and match the jnp reference run on the exact dequantized values."""
    rng = np.random.default_rng(11)
    q, cache, batch, qb = make_case(rng, seq_specs, dtype=jnp.float32)
    stored, deq = _to_scaled_fp8(cache)
    ref = _ragged_paged_attention_jnp(q, jnp.asarray(deq), batch,
                                      page_size=8, sm_scale=0.125, q_bucket=qb)
    S = stored.shape[0]
    n_kv, hd = cache.shape[2], cache.shape[3]
    cache3 = jnp.asarray(np.stack([np.zeros_like(stored), stored,
                                   np.zeros_like(stored)]))
    if qb == 1:
        kv_new = cache3[1][np.asarray(batch.kv_slots)]
        got, cache_out = ragged_paged_attention(
            q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
            sm_scale=0.125, q_bucket=qb, kv_new=kv_new, interpret=INTERPRET)
        np.testing.assert_array_equal(
            np.asarray(cache_out).view(np.uint8),
            np.asarray(cache3).view(np.uint8))   # write is a no-op here
    else:
        got = ragged_paged_attention(
            q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
            sm_scale=0.125, q_bucket=qb, interpret=INTERPRET)
    q_starts = np.asarray(batch.q_starts)
    q_lens = np.asarray(batch.q_lens)
    for b in range(len(q_lens)):
        if q_lens[b] == 0:
            continue
        sl = slice(int(q_starts[b]), int(q_starts[b] + q_lens[b]))
        np.testing.assert_allclose(np.asarray(got[sl]), np.asarray(ref[sl]),
                                   atol=max(ATOL, 1e-4), rtol=1e-3,
                                   err_msg=f"row {b}")


# --------------------------- sliding-window attention ---------------------------

def test_sliding_window_twin_vs_dense_oracle():
    """The jnp twin's window mask vs a from-scratch dense softmax (both
    kernels are parity-tested against the twin, so the twin itself needs an
    independent oracle for the new semantics)."""
    rng = np.random.default_rng(43)
    window = 6
    specs = [(1, 23), (5, 13), (9, 9)]
    q, cache, batch, qb = make_case(rng, specs)
    # Full f32 matmul precision: this test holds the jnp twin to a 1e-5
    # oracle tolerance, which the TPU's default bf16-pass f32 matmuls miss.
    with jax.default_matmul_precision("highest"):
        got = _ragged_paged_attention_jnp(q, cache, batch, page_size=8,
                                          sm_scale=0.125, q_bucket=qb,
                                          window=window)
    cache_np = np.asarray(cache)
    pt = np.asarray(batch.page_table)
    for b, (q_len, seq_len) in enumerate(specs):
        # gather row b's KV in token order
        slots = [pt[b, k // 8] * 8 + k % 8 for k in range(seq_len)]
        k_all = cache_np[slots, 0]               # [S, n_kv, hd]
        v_all = cache_np[slots, 1]
        start = int(batch.q_starts[b])
        for i in range(q_len):
            pos = seq_len - q_len + i
            lo = max(0, pos - window + 1)
            qi = np.asarray(q[start + i])         # [n_q, hd]
            n_q, hd = qi.shape
            group = n_q // k_all.shape[1]
            for h in range(n_q):
                kh = k_all[lo:pos + 1, h // group]      # [W, hd]
                vh = v_all[lo:pos + 1, h // group]
                s = (kh @ qi[h]) * 0.125
                p = np.exp(s - s.max()); p /= p.sum()
                np.testing.assert_allclose(
                    np.asarray(got[start + i, h]), p @ vh, atol=1e-5,
                    rtol=1e-4, err_msg=f"row {b} tok {i} head {h}")


def test_sliding_window_decode_fully_masked_chunks():
    # Long histories at a small window: EARLY CHUNKS ARE FULLY MASKED, which
    # trips the exp(0)=1 online-softmax poison unless the mask sits below m0.
    rng = np.random.default_rng(40)
    case = make_case(rng, [(1, 512), (1, 300), (1, 40), (1, 1)], Pg=64)
    compare(*case, max_chunk_pages=8, window=64)


def test_sliding_window_decode_boundary_mid_chunk():
    rng = np.random.default_rng(44)
    case = make_case(rng, [(1, 100), (1, 77), (1, 64)], Pg=16)
    compare(*case, max_chunk_pages=4, window=50)


def test_sliding_window_prefill_and_mixed():
    rng = np.random.default_rng(41)
    case = make_case(rng, [(16, 16), (8, 40), (1, 33)])
    compare(*case, window=8)


def test_sliding_window_fused_span_prefill():
    # spans of several tiles: per-query window boundaries cross chunk edges
    rng = np.random.default_rng(45)
    case = make_case(rng, [(64, 64), (33, 90)], Pg=16, q_bucket=64)
    compare(*case, max_chunk_pages=4, window=24)


def test_sliding_window_wider_than_history_matches_full():
    rng = np.random.default_rng(42)
    q, cache, batch, qb = make_case(rng, [(1, 17), (4, 29)])
    ref_full = _ragged_paged_attention_jnp(q, cache, batch, page_size=8,
                                           sm_scale=0.125, q_bucket=qb)
    ref_win = _ragged_paged_attention_jnp(q, cache, batch, page_size=8,
                                          sm_scale=0.125, q_bucket=qb,
                                          window=4096)
    np.testing.assert_array_equal(np.asarray(ref_full), np.asarray(ref_win))


def test_spec_span_small_q_bucket():
    """Spec-verify steps run the tile kernel at a SMALL pinned q bucket
    (spec_k+1, e.g. 8) — far below the prefill chunk sizes the other cases
    use. Mixed decode rows + short multi-token spans at q_bucket=8."""
    rng = np.random.default_rng(46)
    case = make_case(rng, [(1, 33), (5, 40), (8, 24), (2, 9)], q_bucket=8)
    compare(*case)


def test_spec_span_small_q_bucket_long_history():
    # short spans over multi-chunk histories (verify-after-long-context)
    rng = np.random.default_rng(47)
    case = make_case(rng, [(4, 300), (1, 512)], Pg=64, q_bucket=8)
    compare(*case, max_chunk_pages=8)


def test_deferred_pending_matches_fused_stepwise():
    """Deferred-commit decode (kv_pend/npend; multi-step windows) must match
    the per-step fused-write kernel run sequentially: at inner step s the
    cache holds only the pre-window history and the s+1 window tokens come
    from the pending buffer. Covers partial validity (pad rows), page-
    boundary crossings inside the window, and scattered page tables."""
    rng = np.random.default_rng(7)
    B, n_q, n_kv, hd, ps, Pg = 8, 4, 2, 64, 8, 8
    W = 2 * n_kv * hd
    S = 4
    hist0 = np.array([17, 33, 5, 1, 9, 25, 0, 0])  # pad rows at the tail
    valid = hist0 > 0
    n_pages = B * Pg + 2
    cache = rng.normal(size=(2, n_pages * ps, W)).astype(np.float32) * 0.5
    pt = np.stack([np.arange(Pg) * B + b + 1 for b in range(B)]).astype(np.int32)
    q_all = rng.normal(size=(S, B, n_q, hd)).astype(np.float32) * 0.5
    kv_all = rng.normal(size=(S, B, W)).astype(np.float32) * 0.5

    def mkbatch(s):
        seq = np.where(valid, hist0 + s + 1, 0).astype(np.int32)
        pos = np.where(valid, hist0 + s, 0).astype(np.int32)
        slots = np.where(valid, pt[np.arange(B), pos // ps] * ps + pos % ps,
                         n_pages * ps - ps)
        return StepBatch(
            token_ids=jnp.zeros(B, jnp.int32),
            positions=jnp.asarray(pos),
            q_starts=jnp.arange(B, dtype=jnp.int32),
            q_lens=jnp.asarray(valid.astype(np.int32)),
            seq_lens=jnp.asarray(seq),
            page_table=jnp.asarray(pt),
            kv_slots=jnp.asarray(slots.astype(np.int32)),
            sample_mask=jnp.asarray(valid),
        )

    c_ref = jnp.asarray(cache)
    outs_ref = []
    for s in range(S):
        o, c_ref = ragged_paged_attention(
            jnp.asarray(q_all[s]), c_ref, jnp.int32(1), mkbatch(s),
            n_kv=n_kv, page_size=ps, sm_scale=0.125, q_bucket=1,
            kv_new=jnp.asarray(kv_all[s]), interpret=INTERPRET)
        outs_ref.append(np.asarray(o))

    from swiftllm_tpu.ops.paged_attention import decode_group_geometry
    R, Bp, GB = decode_group_geometry(B)
    RW = R * W
    c_def = jnp.asarray(cache)   # never written in deferred mode
    # Pending buffer in the kernel's group-major layout [L, GB, S*RW]:
    # slot j of group g holds inner step j's R rows side by side.
    pend = np.zeros((2, GB, S * RW), np.float32)
    for s in range(S):
        o = ragged_paged_attention(
            jnp.asarray(q_all[s]), c_def, jnp.int32(1), mkbatch(s),
            n_kv=n_kv, page_size=ps, sm_scale=0.125, q_bucket=1,
            kv_new=jnp.asarray(kv_all[s]),
            kv_pend=jnp.asarray(pend), npend=jnp.int32(s + 1),
            interpret=INTERPRET)
        np.testing.assert_allclose(
            np.asarray(o)[:B][valid], outs_ref[s][:B][valid],
            atol=ATOL, rtol=1e-4, err_msg=f"inner step {s}")
        # merge step s's rows into slot s (as decode_multi_step does)
        pend[1, :, s * RW:(s + 1) * RW] = kv_all[s].reshape(GB, RW)


def test_bf16_scores_close_to_f32(monkeypatch):
    """Opt-in bf16-score softmax (SWIFTLLM_TILE_BF16_SCORES=1): same results
    as the f32 path to bf16 probability precision (~1e-2 relative) — the
    flag trades HF-exactness for halved VPU softmax passes."""
    rng = np.random.default_rng(3)
    case = make_case(rng, [(16, 40), (9, 9), (32, 64)], n_q=4, n_kv=2, hd=64)
    q, cache, batch, qb = case
    stacked = jnp.stack([jnp.zeros_like(cache), cache])
    S, _, n_kv, hd = cache.shape
    cache3 = stacked.reshape(2, S, 2 * n_kv * hd)

    def run():
        return np.asarray(ragged_paged_attention(
            q, cache3, jnp.int32(1), batch, n_kv=n_kv, page_size=8,
            sm_scale=0.125, q_bucket=qb, interpret=INTERPRET))

    ref = run()
    monkeypatch.setenv("SWIFTLLM_TILE_BF16_SCORES", "1")
    got = run()
    q_starts, q_lens = np.asarray(batch.q_starts), np.asarray(batch.q_lens)
    for b in range(len(q_lens)):
        if q_lens[b] == 0:
            continue
        sl = slice(int(q_starts[b]), int(q_starts[b] + q_lens[b]))
        np.testing.assert_allclose(got[sl], ref[sl], atol=3e-2, rtol=3e-2,
                                   err_msg=f"row {b}")
