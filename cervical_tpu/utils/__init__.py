"""Shared infra: logging, seeding/PRNG threading, config echo."""

from cervical_tpu.utils.logging import Logger, show_config  # noqa: F401
from cervical_tpu.utils.seeding import seed_everything, KeyChain  # noqa: F401
