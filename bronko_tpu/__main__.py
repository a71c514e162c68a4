from bronko_tpu.cli import main

raise SystemExit(main())
