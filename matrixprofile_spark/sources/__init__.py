from matrixprofile_spark.sources.synth import (  # noqa: F401
    n_conv_for_sf,
    synth_transcripts,
    transcripts_sql,
)
