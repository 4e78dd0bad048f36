"""Sampling tests: unit-level (sample_tokens on crafted logits) and end-to-end
(seeded determinism, top_k=1 == greedy) on the tiny dummy model."""

import numpy as np

import jax.numpy as jnp

from swiftllm_tpu.models.sampling import sample_tokens


def _sample(logits, temperature, top_p=1.0, top_k=0, seed=0):
    B = logits.shape[0]
    return np.asarray(sample_tokens(
        jnp.asarray(logits, jnp.float32),
        temperature=jnp.full((B,), temperature, jnp.float32),
        top_p=jnp.full((B,), top_p, jnp.float32),
        top_k=jnp.full((B,), top_k, jnp.int32),
        seeds=jnp.arange(seed, seed + B, dtype=jnp.uint32),
        v_local=logits.shape[1], tp_axis="tp", tp_size=1, tp_rank=0))


def test_greedy_when_temperature_zero():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 64)).astype(np.float32)
    got = _sample(logits, temperature=0.0)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_top_k_one_equals_greedy():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 64)).astype(np.float32)
    got = _sample(logits, temperature=1.0, top_k=1)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_tiny_top_p_equals_greedy():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 64)).astype(np.float32)
    got = _sample(logits, temperature=5.0, top_p=1e-9)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_seeded_determinism_and_variation():
    rng = np.random.default_rng(3)
    logits = np.tile(rng.normal(size=(1, 64)), (16, 1)).astype(np.float32)
    a = _sample(logits, temperature=1.0, seed=100)
    b = _sample(logits, temperature=1.0, seed=100)
    np.testing.assert_array_equal(a, b)
    # same logits, different seeds per row → should not all agree
    assert len(set(a.tolist())) > 1


def test_temperature_distribution():
    # Two-token vocab with known probabilities; check empirical frequency.
    logits = np.zeros((512, 2), np.float32)
    logits[:, 0] = 1.0      # p0 = sigmoid(1) ≈ 0.731
    got = _sample(logits, temperature=1.0, seed=7)
    freq0 = float((got == 0).mean())
    assert 0.65 < freq0 < 0.80, freq0


def test_top_k_restricts_support():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(256, 32)).astype(np.float32) * 0.01
    logits[:, :4] += 10.0   # 4 dominant tokens
    got = _sample(logits, temperature=10.0, top_k=4, seed=11)
    assert set(got.tolist()) <= {0, 1, 2, 3}


def test_model_sampling_end_to_end():
    from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
    from swiftllm_tpu.server.scheduler import ScheduledSeq
    from swiftllm_tpu.server.structs import RawRequest, Request
    from swiftllm_tpu.worker.model import LlamaModel

    mc = LlamaModelConfig(num_layers=2, num_q_heads=4, num_kv_heads=2,
                          hidden_size=64, head_dim=16, ffn_inter_dim=128,
                          vocab_size=128, max_position_embeddings=2048,
                          rms_norm_eps=1e-5)
    ec = EngineConfig(model_path="", use_dummy=True, block_size=16,
                      num_hbm_blocks=32, num_cpu_blocks=0, max_blocks_per_seq=8,
                      max_tokens_in_batch=64, prefill_chunk_size=32,
                      max_seqs_in_block_table=16, use_pallas=False)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()

    def run(seed, temperature):
        for m in model.hbm_block_mgrs:
            m.free_seq(0)
        r = Request(RawRequest("", 1, temperature=temperature, seed=seed))
        r.set_prompt_token_ids([(i * 13) % 128 for i in range(12)])
        r.seq_id = 0
        tokens, rows = model.forward([ScheduledSeq(r, 12)])
        return int(tokens[0])

    assert run(1, 0.0) == run(2, 0.0), "greedy ignores the seed"
    assert run(3, 1.0) == run(3, 1.0), "sampling is deterministic per seed"
    draws = {run(s, 2.0) for s in range(8)}
    assert len(draws) > 1, "high-temperature draws should vary across seeds"
