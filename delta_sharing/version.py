__version__ = "1.0.0+delta_spark"
