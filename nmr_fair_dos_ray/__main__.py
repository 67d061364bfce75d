from nmr_fair_dos_ray.cli import main

raise SystemExit(main())
