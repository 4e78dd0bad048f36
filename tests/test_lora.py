"""Multi-LoRA serving (beyond the reference — base weights only).

Golden: a mixed batch (base row + two adapter rows) through ONE jitted step
matches, per row, an HF model with that adapter's weights merged
(W' = W + alpha/r * B@A) — including at tp=2 where out-sharded B halves and
in-sharded A halves ride the projections' existing collectives. Engine:
dummy adapters route by name, unknown names are rejected at submit.
"""

import asyncio
import json

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request

TARGETS = ["q_proj", "v_proj", "o_proj", "gate_proj"]
RANK = 4


def _write_peft_adapter(path, hf_cfg, rank, alpha, seed):
    """Hand-rolled HF-peft checkpoint (adapter_config.json + safetensors)."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    D = hf_cfg.hidden_size
    hd = D // hf_cfg.num_attention_heads
    dims = {"q_proj": (D, D), "v_proj": (D, hf_cfg.num_key_value_heads * hd),
            "o_proj": (D, D), "gate_proj": (D, hf_cfg.intermediate_size)}
    tensors = {}
    for layer in range(hf_cfg.num_hidden_layers):
        for mod in TARGETS:
            din, dout = dims[mod]
            base = f"base_model.model.model.layers.{layer}.self_attn.{mod}" \
                if mod in ("q_proj", "v_proj", "o_proj") else \
                f"base_model.model.model.layers.{layer}.mlp.{mod}"
            tensors[f"{base}.lora_A.weight"] = (
                rng.standard_normal((rank, din)) * 0.1).astype(np.float32)
            tensors[f"{base}.lora_B.weight"] = (
                rng.standard_normal((dout, rank)) * 0.1).astype(np.float32)
    path.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(json.dumps(
        {"r": rank, "lora_alpha": alpha, "target_modules": TARGETS}))


def _merged_hf(hf_model, adapter_path):
    """A deep copy of the HF model with the adapter merged into its weights."""
    import copy

    import torch
    from safetensors.numpy import load_file
    cfg = json.loads((adapter_path / "adapter_config.json").read_text())
    scale = cfg["lora_alpha"] / cfg["r"]
    merged = copy.deepcopy(hf_model)
    tensors = load_file(str(adapter_path / "adapter_model.safetensors"))
    for name, a in tensors.items():
        if ".lora_A." not in name:
            continue
        b = tensors[name.replace(".lora_A.", ".lora_B.")]
        target = name[len("base_model.model."):].replace(".lora_A.weight", "")
        mod = merged.get_submodule(target)
        with torch.no_grad():
            mod.weight += torch.tensor(scale * (b @ a))
    return merged


@pytest.fixture(scope="module")
def lora_setup(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    root = tmp_path_factory.mktemp("lora")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5)
    torch.manual_seed(9)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(root / "base", safe_serialization=True)
    _write_peft_adapter(root / "a1", cfg, RANK, alpha=8, seed=100)
    _write_peft_adapter(root / "a2", cfg, RANK, alpha=4, seed=200)
    return root, hf, cfg


@pytest.mark.parametrize("tp", [1, 2])
def test_lora_mixed_batch_matches_merged_hf(lora_setup, tp):
    import torch

    from tests.test_llama_golden import make_model
    root, hf, cfg = lora_setup
    m = make_model(str(root / "base"), tp=tp,
                   lora_paths=f"a1={root / 'a1'},a2={root / 'a2'}")
    assert m.lora_slots == {"a1": 1, "a2": 2}

    prompt = [1, 7, 3, 9, 11, 5]
    reqs = []
    for i, slot in enumerate([0, 1, 2]):
        r = Request(RawRequest("", 1))
        r.set_prompt_token_ids(list(prompt))
        r.seq_id, r.lora_slot = i, slot
        reqs.append(r)
    tokens, rows, logits = m.forward(
        [ScheduledSeq(r, r.prompt_len) for r in reqs], return_logits=True)

    expected_models = [hf, _merged_hf(hf, root / "a1"),
                       _merged_hf(hf, root / "a2")]
    with torch.no_grad():
        for i, em in enumerate(expected_models):
            want = em(torch.tensor([prompt])).logits[0, -1].numpy()
            np.testing.assert_allclose(logits[i][:len(want)], want,
                                       atol=5e-4, rtol=2e-3,
                                       err_msg=f"row {i} (tp={tp})")


def test_engine_dummy_loras_route_and_reject():
    from tests.test_engine import make_engine, run_engine, tiny_engine_config

    async def body():
        engine = make_engine(tiny_engine_config(lora_paths="dummy:x,y,r=4"))
        await engine.initialize(tokenizer_backend="inline")
        assert engine.model.lora_slots == {"x": 1, "y": 2}

        async def clients():
            outs = await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", 6, prompt_token_ids=list(range(12)),
                               lora=name))
                for name in (None, "x", "y")])
            return outs

        outs = await run_engine(engine, clients())
        toks = [t for _, t in outs]
        assert all(len(t) == 6 for t in toks)
        assert toks[0] != toks[1], "adapter x should perturb the output"

        # Unknown adapter: rejected at submit (aborted, no tokens).
        req = engine.submit(RawRequest("", 4, prompt_token_ids=[1, 2, 3],
                                       lora="nope"))
        assert req.aborted
    asyncio.run(body())
