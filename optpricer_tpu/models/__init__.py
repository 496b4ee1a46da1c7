# optpricer_tpu.models — pricing engines and market models.
