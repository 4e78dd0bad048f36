"""Weight loading: HF checkpoints → sharded jax.Arrays.

Capability parity with the reference's declarative loader (swiftllm/worker/
weight.py:9-272): three getters (dummy random / safetensors with optional
index / pytorch .bin with optional index), shape validation, Llama-3.2
tied-embedding aliasing. TPU-native differences: tensors are transposed to
[in, out] GEMM layout, stacked across layers for ``lax.scan``, and placed
shard-by-shard with ``jax.device_put`` under NamedSharding.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.models.llama import compute_inv_freq
from swiftllm_tpu.parallel.mesh import GEMM_KEYS, param_specs, named
from swiftllm_tpu.utils import cdiv


def _torch_to_numpy(t) -> np.ndarray:
    """Convert a (possibly bf16) torch CPU tensor to numpy without precision loss."""
    import torch
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


# --- getters: name -> np.ndarray --------------------------------------------------

def _dummy_params_on_device(engine_config: EngineConfig,
                            mc: LlamaModelConfig, mesh) -> dict:
    """Dummy weights generated ON DEVICE (reference weight.py:215-218 builds
    them on host): uniform(-1e-3, 1e-3), deterministic (fixed per-leaf PRNG
    keys in traversal order — identical across processes, which multi-host
    dummy runs rely on). ONE jitted program fills the whole tree directly
    into its NamedShardings, so dummy startup uploads ZERO bytes — on the
    tunneled chip the old host-build-then-upload path took 250-690s at 8B
    dims; this takes one compile + a sub-second device fill.

    Quantized modes quantize the same underlying uniform randoms ON DEVICE
    (quantize_weight_jax — per layer under ``lax.map`` so the f32 source
    exists one layer at a time, never as a whole multi-GB stack), so a dummy
    int8/int4 run is numerically the quantization of the dummy bf16 run.
    """
    from swiftllm_tpu.worker.quant import quantize_weight_jax
    dtype = jnp.dtype(engine_config.dtype)
    quant = engine_config.quant
    tp = mesh.shape["tp"]
    D, hd = mc.hidden_size, mc.head_dim
    nq, F, V, L = mc.num_q_heads, mc.ffn_inter_dim, mc.vocab_size, mc.num_layers
    nkv_eff = effective_num_kv_heads(mc, tp)
    Vp = cdiv(V, tp) * tp
    tied = mc.tie_word_embeddings

    shardings = named(mesh, param_specs(
        quant, quantized_lm_head=(quant != "none" and not tied),
        qkv_bias=mc.qkv_bias))

    counter = [0]

    def next_key():
        key = jax.random.fold_in(jax.random.key(0), counter[0])
        counter[0] += 1
        return key

    def w(shape):
        return jax.random.uniform(next_key(), shape, jnp.float32,
                                  -1e-3, 1e-3).astype(dtype)

    def gemm(shape):
        """[..., out, in] projection in its quantized storage format. The SAME
        per-leaf/per-layer keys feed both the plain and quantized paths, so
        the logits of a dummy quantized model track the dummy bf16 model's."""
        def make(k, shp):
            u = jax.random.uniform(k, shp, jnp.float32, -1e-3, 1e-3)
            return u.astype(dtype) if quant == "none" else \
                quantize_weight_jax(u, quant)
        key = next_key()
        if len(shape) == 3:
            keys = jax.random.split(key, shape[0])
            return jax.lax.map(lambda k: make(k, shape[1:]), keys)
        return make(key, shape)

    def build():
        layers = {
            "attn_norm": w((L, D)),
            "wq": gemm((L, nq * hd, D)),
            "wk": gemm((L, nkv_eff * hd, D)),
            "wv": gemm((L, nkv_eff * hd, D)),
            "wo": gemm((L, D, nq * hd)),
            "ffn_norm": w((L, D)),
            "w_gate": gemm((L, F, D)),
            "w_up": gemm((L, F, D)),
            "w_down": gemm((L, D, F)),
        }
        if mc.qkv_bias:   # Qwen2-style additive q/k/v biases
            layers.update(bq=w((L, nq * hd)), bk=w((L, nkv_eff * hd)),
                          bv=w((L, nkv_eff * hd)))
        embed = w((Vp, D))
        if tied:
            lm_head = embed
        elif quant != "none":
            lm_head = gemm((Vp, D))
        else:
            lm_head = w((Vp, D))
        return {
            "embed": embed,
            "lm_head": lm_head,
            "final_norm": w((D,)),
            "inv_freq": jnp.asarray(compute_inv_freq(mc)),  # exact, not random
            "layers": layers,
        }

    return jax.jit(build, out_shardings=shardings)()


def _safetensors_getter(path: str):
    from safetensors import safe_open
    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path, encoding="utf-8") as f:
            weight_map = json.load(f)["weight_map"]
        files = {fn: None for fn in weight_map.values()}
    else:
        weight_map = None
        files = {"model.safetensors": None}

    handles: dict[str, object] = {}

    def get_handle(fn: str):
        if fn not in handles:
            handles[fn] = safe_open(os.path.join(path, fn), framework="pt")
        return handles[fn]

    def get(name: str, shape: tuple) -> np.ndarray:
        fn = weight_map[name] if weight_map else "model.safetensors"
        arr = _torch_to_numpy(get_handle(fn).get_tensor(name))
        assert tuple(arr.shape) == tuple(shape), f"{name}: {arr.shape} != {shape}"
        return arr
    return get


def _torch_bin_getter(path: str):
    import torch
    index_path = os.path.join(path, "pytorch_model.bin.index.json")
    if os.path.exists(index_path):
        with open(index_path, encoding="utf-8") as f:
            weight_map = json.load(f)["weight_map"]
    else:
        weight_map = {None: "pytorch_model.bin"}
    cache: dict[str, dict] = {}

    def get(name: str, shape: tuple) -> np.ndarray:
        fn = weight_map.get(name, "pytorch_model.bin")
        if fn not in cache:
            cache[fn] = torch.load(os.path.join(path, fn), map_location="cpu",
                                   mmap=True, weights_only=True)
        arr = _torch_to_numpy(cache[fn][name])
        assert tuple(arr.shape) == tuple(shape), f"{name}: {arr.shape} != {shape}"
        return arr
    return get


def _pick_getter(engine_config: EngineConfig, model_config: LlamaModelConfig, dtype):
    path = engine_config.model_path
    if (os.path.exists(os.path.join(path, "model.safetensors"))
            or os.path.exists(os.path.join(path, "model.safetensors.index.json"))):
        return _safetensors_getter(path)
    if (os.path.exists(os.path.join(path, "pytorch_model.bin"))
            or os.path.exists(os.path.join(path, "pytorch_model.bin.index.json"))):
        return _torch_bin_getter(path)
    raise FileNotFoundError(f"no supported checkpoint found under {path}")


# --- assembly ---------------------------------------------------------------------

def effective_num_kv_heads(model_config: LlamaModelConfig, tp: int) -> int:
    """KV heads actually materialized: replicated up to tp when tp > num_kv_heads."""
    nkv = model_config.num_kv_heads
    if tp <= nkv:
        assert nkv % tp == 0, f"num_kv_heads={nkv} not divisible by tp={tp}"
        return nkv
    assert tp % nkv == 0, f"tp={tp} not a multiple of num_kv_heads={nkv}"
    return tp

def load_params(engine_config: EngineConfig, model_config: LlamaModelConfig,
                mesh) -> dict:
    """Build the params pytree, sharded over `mesh` per PARAM_SPECS.

    Layout: projections transposed to [in, out]; per-layer tensors stacked on a
    leading L axis for the layer scan.
    """
    mc = model_config
    if engine_config.use_dummy:
        return _dummy_params_on_device(engine_config, mc, mesh)
    dtype = jnp.dtype(engine_config.dtype)
    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(engine_config.dtype)
    get = _pick_getter(engine_config, mc, np_dtype)

    D, hd = mc.hidden_size, mc.head_dim
    nq, nkv, F, V, L = (mc.num_q_heads, mc.num_kv_heads, mc.ffn_inter_dim,
                        mc.vocab_size, mc.num_layers)

    def gemm(name, shape_torch):
        """Fetch a torch [out, in] projection, kept in that layout.

        [out, in] puts the contraction axis on lanes — the layout XLA's TPU
        matmul emitter wants for the weight operand. Storing [in, out]
        instead costs a per-layer [8 MB] layout-change copy of every scanned
        weight slice (measured: ~22 µs/layer on v5e, ~0.5 ms/step at 1B)."""
        return get(name, shape_torch).astype(np_dtype)

    layer_names = {
        "attn_norm": ("model.layers.{i}.input_layernorm.weight", (D,), False),
        "wq": ("model.layers.{i}.self_attn.q_proj.weight", (nq * hd, D), True),
        "wk": ("model.layers.{i}.self_attn.k_proj.weight", (nkv * hd, D), True),
        "wv": ("model.layers.{i}.self_attn.v_proj.weight", (nkv * hd, D), True),
        "wo": ("model.layers.{i}.self_attn.o_proj.weight", (D, nq * hd), True),
        "ffn_norm": ("model.layers.{i}.post_attention_layernorm.weight", (D,), False),
        "w_gate": ("model.layers.{i}.mlp.gate_proj.weight", (F, D), True),
        "w_up": ("model.layers.{i}.mlp.up_proj.weight", (F, D), True),
        "w_down": ("model.layers.{i}.mlp.down_proj.weight", (D, F), True),
    }
    if mc.qkv_bias:   # Qwen2: q/k/v carry biases (o/mlp do not)
        layer_names.update(
            bq=("model.layers.{i}.self_attn.q_proj.bias", (nq * hd,), False),
            bk=("model.layers.{i}.self_attn.k_proj.bias", (nkv * hd,), False),
            bv=("model.layers.{i}.self_attn.v_proj.bias", (nkv * hd,), False))

    quant = engine_config.quant
    layers = {}
    for key, (tmpl, shape, is_gemm) in layer_names.items():
        per_layer = []
        for i in range(L):
            name = tmpl.format(i=i)
            per_layer.append(gemm(name, shape) if is_gemm
                             else get(name, shape).astype(np_dtype))
        layers[key] = np.stack(per_layer)

    tp = mesh.shape["tp"]
    for ax_name, dim in (("num_q_heads", nq), ("ffn_inter_dim", F)):
        assert dim % tp == 0, f"{ax_name}={dim} not divisible by tp={tp}"

    # KV-head replication for tp > num_kv_heads: each replica serves its q-head
    # group; replicas of old head h are placed consecutively so the GQA q→kv
    # mapping (q_head // group) is preserved.
    nkv_eff = effective_num_kv_heads(mc, tp)
    if nkv_eff != nkv:
        rep = nkv_eff // nkv
        for key in ("wk", "wv"):
            w = layers[key].reshape(-1, nkv, hd, D)
            layers[key] = np.ascontiguousarray(
                np.repeat(w, rep, axis=1).reshape(-1, nkv_eff * hd, D))
        for key in ("bk", "bv"):
            if key in layers:
                b = layers[key].reshape(-1, nkv, hd)
                layers[key] = np.ascontiguousarray(
                    np.repeat(b, rep, axis=1).reshape(-1, nkv_eff * hd))

    # Weight-only quantization at load time (none | int8 | int4), applied
    # layer-by-layer: a whole-stack f32 working copy of an 8B projection is
    # ~7.5 GB of pointless peak host memory. (Dummy mode quantizes one slice;
    # the broadcast in _place_dummy replicates it across layers on device.)
    if quant != "none":
        from swiftllm_tpu.worker.quant import quantize_weight
        for key in GEMM_KEYS:
            w = layers[key]
            qd = [quantize_weight(w[i], quant) for i in range(w.shape[0])]
            layers[key] = {k: np.stack([d[k] for d in qd]) for k in qd[0]}

    def pad_vocab(w: np.ndarray) -> np.ndarray:
        """Pad the vocab axis to a multiple of tp; the sampler masks the padding."""
        vp = cdiv(V, tp) * tp
        if vp == V:
            return w
        return np.concatenate([w, np.zeros((vp - V, D), w.dtype)], axis=0)

    embed = pad_vocab(get("model.embed_tokens.weight", (V, D)).astype(np_dtype))
    if mc.tie_word_embeddings:
        # Llama-3.2-style tied embeddings (reference weight.py:157-170). The
        # embedding must stay gatherable, so no lm_head quantization here.
        lm_head = embed
    else:
        lm_head = pad_vocab(get("lm_head.weight", (V, D)).astype(np_dtype))
        if quant != "none":
            # Quantize the lm_head too (per-vocab-row scales) — at 128k-vocab
            # models it is ~1 GB of per-step decode traffic. [V, D] is already
            # the [out, in] GEMM layout the sampling head's quant.proj uses.
            from swiftllm_tpu.worker.quant import quantize_weight
            lm_head = quantize_weight(lm_head, quant)

    host_params = {
        "embed": embed,
        "lm_head": lm_head,
        "final_norm": get("model.norm.weight", (D,)).astype(np_dtype),
        "inv_freq": compute_inv_freq(mc),
        "layers": layers,
    }

    shardings = named(mesh, param_specs(
        quant, quantized_lm_head=isinstance(lm_head, dict),
        qkv_bias=mc.qkv_bias))
    return jax.tree.map(lambda arr, s: jax.device_put(arr, s), host_params, shardings)
