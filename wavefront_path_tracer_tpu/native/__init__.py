"""Native (C++) components, loaded via ctypes.

Build happens on demand with the system toolchain; artifacts are cached
next to the sources and rebuilt when the source is newer.
"""
