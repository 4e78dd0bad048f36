"""TRUE multi-process broadcast/follower test on the CPU backend.

Spawns 2 OS processes joined through a localhost ``jax.distributed``
coordinator, each owning 2 virtual CPU devices of a global 4-device
("dp","tp") = (2,2) mesh. Process 0 is the primary: it builds a real step
batch and calls ``model.forward`` (which broadcasts the packed batch through
``parallel.distributed``); process 1 replays it follower-style via
``exchange_op`` + ``execute_packed``. Both must print identical sampled
tokens — exercising the packed-length formula, the op header, and the
dp-replicated token output across a real process boundary (the r1
``broadcast_step`` length bug could only be caught by a test like this).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import numpy as np
from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.parallel import distributed
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request
from swiftllm_tpu.worker.model import LlamaModel

mc = LlamaModelConfig(num_layers=2, num_q_heads=8, num_kv_heads=4,
                      hidden_size=256, head_dim=32, ffn_inter_dim=512,
                      vocab_size=1024, max_position_embeddings=2048,
                      rms_norm_eps=1e-5)
ec = EngineConfig(model_path="", use_dummy=True, block_size=16,
                  max_tokens_in_batch=128, max_blocks_per_seq=16,
                  num_hbm_blocks=32, num_cpu_blocks=8, prefill_chunk_size=32,
                  max_batch_size=4, max_seqs_in_block_table=64,
                  use_pallas=False, dp_size=2, tp_size=2,
                  lora_paths="dummy:z,r=4",   # deterministic across processes
                  compilation_cache_dir="")
model = LlamaModel(ec, mc)
model.load_weights()
model.init_kvcache_and_swap()

if distributed.is_primary():
    groups = []
    for g in range(2):
        r = Request(RawRequest("", 4))
        r.set_prompt_token_ids([(17 * g + j) % 1024 for j in range(12)])
        r.seq_id, r.dp_group = 0, g
        r.lora_slot = g   # group 1 routes through adapter "z" (slot 1)
        groups.append([ScheduledSeq(r, r.prompt_len)])
    # two steps: a prefill step, then a decode step (feedback-fed)
    tokens, rows = model.forward([s for g in groups for s in g], groups=groups)
    print("TOKENS0", np.asarray(tokens)[:8].tolist(), flush=True)
    for g in groups:
        for s in g:
            s.request.num_cached_tokens += s.n_tokens
            s.request.output_token_ids.append(None)  # on-device (feedback-fed)
    groups2 = [[ScheduledSeq(s.request, 1) for s in g] for g in groups]
    tokens2, _ = model.forward([s for g in groups2 for s in g], groups=groups2)
    print("TOKENS1", np.asarray(tokens2)[:8].tolist(), flush=True)
    # KV host-offload round-trip under multi-host: swap group 0's sequence
    # out to every process's swap pool and back, then decode one more step —
    # both hosts must still agree (the swap ops ride the same op channel).
    for g in groups2:
        for s in g:
            s.request.num_cached_tokens += s.n_tokens
            s.request.output_token_ids.append(None)
    r0 = groups2[0][0].request
    model.swap_out_seqs([r0])
    model.swap_in_seqs([r0])
    groups3 = [[ScheduledSeq(s.request, 1) for s in g] for g in groups2]
    tokens3, _ = model.forward([s for g in groups3 for s in g], groups=groups3)
    print("TOKENS2", np.asarray(tokens3)[:8].tolist(), flush=True)
    distributed.stop_followers()
else:
    i = 0
    while True:
        op, key, flat = distributed.exchange_op(dp=model.dp)
        if op == distributed.OP_STOP:
            break
        if op == distributed.OP_SWAP_OUT:
            model.apply_swap_out(flat)
            print("SWAPPED_OUT", flush=True)
            continue
        if op == distributed.OP_SWAP_IN:
            model.apply_swap_in(flat)
            print("SWAPPED_IN", flush=True)
            continue
        toks = model.execute_packed(flat, key)
        print(f"TOKENS{i}", np.asarray(jax.device_get(toks))[:8].tolist(),
              flush=True)
        i += 1
print("DONE", flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_broadcast_serving(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, PYTHONPATH="/root/repo",
               SWIFTLLM_KEEP_PLATFORM="")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd="/root/repo")
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "DONE" in out
    tok_lines = [sorted(line for line in out.splitlines()
                        if line.startswith("TOKENS"))
                 for _, out, _ in outs]
    assert tok_lines[0] == tok_lines[1] != [], \
        f"primary and follower disagree: {tok_lines}"
