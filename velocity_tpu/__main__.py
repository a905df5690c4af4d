from velocity_tpu.cli import main

raise SystemExit(main())
