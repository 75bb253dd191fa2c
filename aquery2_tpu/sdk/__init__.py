"""Extension SDK: user modules callable from SQL.

Counterpart of the reference's ``sdk/`` (user .so modules exporting
``__AQEXPORT__`` functions, loaded with `LOAD MODULE FROM "lib.so"
FUNCTIONS (...)`, server.cpp:308-331, engine/ast.py:1377-1416).

Two module kinds are supported here:
  * **Python modules** (path ends in .py): functions receive NumPy/JAX
    arrays; jittable functions compose into the engine's device pipeline.
    This is the TPU-native extension point — a user kernel is a traced
    JAX function, not a dlopen'd symbol.
  * **C shared libraries** (.so) via ctypes with the simple C ABI defined
    in sdk/aquery_tpu_module.h (vectors = pointer+length pairs). The
    reference's C++ vector_type ABI is not binary-compatible with a
    TPU-resident engine; modules recompile against our header.
"""

from aquery2_tpu.sdk.modules import load_module, call_module_function, ModuleFunction
