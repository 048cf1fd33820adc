from redpanda_spark.cli import main

raise SystemExit(main())
