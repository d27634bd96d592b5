from swtpu.ops.variants import (  # noqa: F401
    VARIANTS,
    best_engine,
    get_variant,
)
