from delta_spark import __version__  # noqa: F401
