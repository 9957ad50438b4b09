"""`python -m montecarlo_tpu.cli` -> the CLI."""

from montecarlo_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
