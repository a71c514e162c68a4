from bronko_tpu.index.model import BronkoIndex, FileMeta, SeqMeta  # noqa: F401
from bronko_tpu.index.build import build_index  # noqa: F401
from bronko_tpu.index.store import load_index, save_index  # noqa: F401
