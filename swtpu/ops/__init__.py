from swtpu.ops.variants import VARIANTS, get_variant  # noqa: F401
