from .caching import release_scoped, scoped_persist  # noqa: F401
from .hashing import hash64, hash64_sql, seeded_md5, seeded_md5_sql  # noqa: F401
from .vectors import cosine_similarity, cosine_similarity_sql  # noqa: F401
