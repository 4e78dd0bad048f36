"""swiftllm-tpu: a TPU-native LLM serving framework (JAX/XLA/Pallas).

Public surface mirrors the reference (swiftllm/__init__.py:1-9): EngineConfig,
Engine, RawRequest, LlamaModel — plus the model/engine config types.
"""

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.structs import RawRequest, Request, StepOutput

__all__ = [
    "EngineConfig",
    "LlamaModelConfig",
    "RawRequest",
    "Request",
    "StepOutput",
    "Engine",
    "LlamaModel",
]


def __getattr__(name):
    # Lazy imports: Engine/LlamaModel pull in jax; keep pure-control-plane users light.
    if name == "Engine":
        from swiftllm_tpu.server.engine import Engine
        return Engine
    if name == "LlamaModel":
        from swiftllm_tpu.worker.model import LlamaModel
        return LlamaModel
    raise AttributeError(name)
