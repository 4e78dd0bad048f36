"""Native (C++) host-side components.

The reference's native tier is a pybind11 CUDA extension for KV block swapping
(csrc/, SURVEY.md §2.4 N1). Here the native tier is a small C++ shared library
for host-memory paged copies (the host half of swap; device transfers are
JAX's job), built on demand with g++ and called through ctypes.
"""

from swiftllm_tpu.native.page_copy import copy_pages, is_available  # noqa: F401
