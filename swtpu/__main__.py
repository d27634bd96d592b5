from swtpu.cli import main

main()
