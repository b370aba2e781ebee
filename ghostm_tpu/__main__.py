from ghostm_tpu.cli import main

raise SystemExit(main())
