"""``python -m geneticalgorithmsusingmapreduce_spark`` — reference-CLI
parity entry point (see cli.py for the argv contract)."""

from .cli import main

if __name__ == "__main__":
    main()
