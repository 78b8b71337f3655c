from .hashing import hash64, md5_min_signature  # noqa: F401
from .vectors import cosine_similarity  # noqa: F401
