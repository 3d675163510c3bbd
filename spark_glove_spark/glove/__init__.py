from spark_glove_spark.glove.trainer import Glove, GloveConfig, GloveModel

__all__ = ["Glove", "GloveConfig", "GloveModel"]
