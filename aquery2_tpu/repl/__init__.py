from aquery2_tpu.repl.prompt import Repl, main

__all__ = ["Repl", "main"]
