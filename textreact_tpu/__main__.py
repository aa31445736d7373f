"""`python -m textreact_tpu` -> the training/eval CLI."""

from .cli.main import main

if __name__ == "__main__":
    main()
