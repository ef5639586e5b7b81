"""``python -m titanet_tpu`` — alias for :mod:`titanet_tpu.cli`."""

from titanet_tpu.cli import main

if __name__ == "__main__":
    main()
