from datapump_spark.cli import main

raise SystemExit(main())
