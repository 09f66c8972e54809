"""Native (C++) components: BVH builder. Optional; NumPy fallbacks exist."""
