from pinns_tpu.cli import main

raise SystemExit(main())
