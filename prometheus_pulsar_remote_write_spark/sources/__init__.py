"""Wire-edge codecs and decode operators for the ingest/egress boundaries."""
