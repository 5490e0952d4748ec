from .logger import Logger, NullLogger
from .checkpointing import save_checkpoint, load_checkpoint
