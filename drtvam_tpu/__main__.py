"""`python -m drtvam_tpu config.json` — the CLI entry point
(equivalent of the reference's `drtvam` console script,
pyproject.toml:33-34)."""
from .opt.optimize import main

main()
