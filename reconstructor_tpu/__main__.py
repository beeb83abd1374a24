from reconstructor_tpu.cli import main

raise SystemExit(main())
