"""Online serving example — full control+data plane (reference examples/online.py:65-86).

Submits requests at staggered arrival times to a running in-process Engine and
prints per-token latencies for the streamed outputs. With --use-dummy it runs
without a checkpoint or tokenizer.
"""

import argparse
import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.engine import Engine
from swiftllm_tpu.server.structs import RawRequest


async def send_request_and_stream(engine: Engine, prompt: str, output_len: int,
                                  delay_s: float, tag: str):
    await asyncio.sleep(delay_s)
    t_submit = time.perf_counter()
    latencies = []
    last = t_submit
    token_ids = []
    async for step_output in engine.add_request_and_stream(
            RawRequest(prompt, output_len)):
        now = time.perf_counter()
        latencies.append(now - last)
        last = now
        token_ids.append(step_output.token_id)
    ttft = latencies[0] if latencies else 0.0
    tpot = (sum(latencies[1:]) / max(len(latencies) - 1, 1))
    print(f"[{tag}] {len(token_ids)} tokens; TTFT {ttft * 1e3:.1f} ms, "
          f"TPOT {tpot * 1e3:.1f} ms")
    if engine.tokenizer is not None:
        text = await engine.tokenizer.decode(token_ids)
        print(f"[{tag}] output: {text!r}")


async def main_async(args: argparse.Namespace):
    engine_config = EngineConfig.from_cli_args(args)
    if engine_config.use_dummy and not engine_config.model_path:
        model_config = LlamaModelConfig(
            num_layers=4, num_q_heads=8, num_kv_heads=4, hidden_size=256, head_dim=32,
            ffn_inter_dim=512, vocab_size=1000, max_position_embeddings=2048,
            rms_norm_eps=1e-5)
    else:
        model_config = None

    engine = Engine(engine_config, model_config)
    await engine.initialize(tokenizer_backend="thread" if not engine_config.use_dummy
                            else "inline")
    loops_task = asyncio.create_task(engine.start_all_event_loops())

    prompts = [
        ("Life blooms like a flower. Far away or by the road. Waiting", 0.0),
        ("A quick brown fox", 0.5),
        ("Artificial intelligence is", 1.0),
        ("To be or not to be,", 1.5),
    ]
    clients = [send_request_and_stream(engine, p, args.output_len, d, f"req{i}")
               for i, (p, d) in enumerate(prompts)]
    await asyncio.gather(*clients)
    print("engine stats:", engine.stats.snapshot())
    loops_task.cancel()


def main():
    parser = argparse.ArgumentParser()
    EngineConfig.add_cli_args(parser)
    parser.add_argument("--output-len", type=int, default=20)
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.use_pallas = False   # Mosaic kernels need a real TPU
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
