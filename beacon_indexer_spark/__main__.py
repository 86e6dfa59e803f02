from beacon_indexer_spark.cli import main

raise SystemExit(main())
