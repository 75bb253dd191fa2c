"""`python -m aquery2_tpu [script.a | -c "sql"]` — launch the REPL
(the reference's `python3 prompt.py` entry, prompt.py:745-787)."""

from aquery2_tpu.repl.prompt import main

raise SystemExit(main())
