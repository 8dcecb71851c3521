"""Interactive mini-language parsing (image_database.py:2105-2239) as pure
unit tests (SURVEY.md §4.4)."""

from tpuclip.cli import display_query_string, parse_interactive_line


def test_quit_variants():
    for line in ("quit", "exit", "q", "QUIT", " Exit "):
        assert parse_interactive_line(line).kind == "quit"


def test_empty():
    assert parse_interactive_line("   ").kind == "empty"


def test_set_k():
    cmd = parse_interactive_line("k:25")
    assert cmd.kind == "set_k" and cmd.k == 25
    assert parse_interactive_line("k:abc").kind == "error"
    assert parse_interactive_line("K: 30").k == 30


def test_folder_commands():
    cmd = parse_interactive_line("folder:/data/photos")
    assert cmd.kind == "folder" and cmd.folder == "/data/photos"
    assert parse_interactive_line("folder:clear").kind == "folder_clear"
    assert parse_interactive_line("folder:CLEAR").kind == "folder_clear"


def test_duplicates_commands():
    assert parse_interactive_line("duplicates:show").show_duplicates is True
    assert parse_interactive_line("duplicates:hide").show_duplicates is False
    assert parse_interactive_line("duplicates:maybe").kind == "error"


def test_plain_text_query():
    cmd = parse_interactive_line("a red car")
    assert cmd.kind == "search"
    s = cmd.search
    assert s.query == "a red car" and not s.is_image
    assert s.query2 is None and s.negative_query is None


def test_image_query():
    s = parse_interactive_line("image:/data/img.jpg").search
    assert s.query == "/data/img.jpg" and s.is_image


def test_image_query_windows_drive():
    """'image:C:\\x\\y.jpg' must keep the drive letter (split(':', 1) once)."""
    s = parse_interactive_line(r"image:C:\pics\cat.jpg").search
    assert s.query == r"C:\pics\cat.jpg" and s.is_image


def test_single_negative():
    s = parse_interactive_line("colourful design - grey monochrome").search
    assert s.query == "colourful design"
    assert s.negative_query == "grey monochrome"
    assert not s.negative_is_image
    assert s.negative_queries is None


def test_multiple_negatives():
    s = parse_interactive_line("design - grey - abstract").search
    assert s.query == "design"
    assert s.negative_queries == ["grey", "abstract"]
    assert s.negative_is_images == [False, False]
    assert s.negative_weights == [0.5, 0.5]


def test_negative_image():
    s = parse_interactive_line("cat - image:/neg.jpg").search
    assert s.negative_query == "/neg.jpg" and s.negative_is_image


def test_combined_text_queries():
    s = parse_interactive_line("red car + sunset").search
    assert s.query == "red car" and s.query2 == "sunset"
    assert not s.is_image and not s.is_image2


def test_combined_image_and_text():
    s = parse_interactive_line("image:/a.jpg + blue sky").search
    assert s.query == "/a.jpg" and s.is_image
    assert s.query2 == "blue sky" and not s.is_image2


def test_combined_with_negatives():
    # negatives split first, then '+' applies to the head
    s = parse_interactive_line("red car + sunset - grey - noise").search
    assert s.query == "red car" and s.query2 == "sunset"
    assert s.negative_queries == ["grey", "noise"]


def test_hyphenated_words_not_negatives():
    # ' - ' requires spaces; hyphenated words survive
    s = parse_interactive_line("blue-green pattern").search
    assert s.query == "blue-green pattern"
    assert s.negative_query is None


def test_display_query_string():
    s = parse_interactive_line("a + b - c - d").search
    assert display_query_string(s) == "a + b - c - d"


def test_parser_fuzz_never_crashes():
    """Property fuzz: the parser must return a well-formed ReplCommand for
    ANY input line — a malformed session line may produce an 'error' command
    but never an exception (the reference's loop survives bad input too,
    image_database.py:2297-2299)."""
    import random

    from tpuclip.cli import ReplCommand, SearchSpec, parse_interactive_line

    rng = random.Random(99)
    tokens = [
        "image:", "k:", "folder:", "duplicates:", "+", " - ", "-", ":", "",
        "quit", "a red car", "C:\\photos\\x.jpg", "/abs/path.png", "show",
        "hide", "clear", "0", "-3", "9999999999999999999999", "café",
        "\x00", "\t", " ", '"', "'", "image:image:", "k:k:", "++", "--",
        "a + b + c", "a - ", " - b", "+ a", "\u202e", "🙂",
    ]
    kinds = {"quit", "empty", "set_k", "folder", "folder_clear",
             "duplicates", "search", "error"}
    for trial in range(3000):
        parts = [rng.choice(tokens) for _ in range(rng.randrange(1, 6))]
        line = rng.choice(["", " "]).join(parts)
        for weight in (0.5, 0.0, -1.0, 2.5):
            cmd = parse_interactive_line(line, weight)
            assert isinstance(cmd, ReplCommand)
            assert cmd.kind in kinds, (line, cmd.kind)
            if cmd.kind == "search":
                spec = cmd.search
                assert isinstance(spec, SearchSpec)
                assert isinstance(spec.query, str)
                # an empty query1 is reachable through the combined form
                # ("+ b" splits to '', 'b') and through a bare "image:" —
                # the reference tolerates both degenerate cases and its
                # embed containment turns them into "no results"
                # (image_database.py:2194-2213, :2227-2230)
                assert spec.query or spec.query2 is not None or spec.is_image
                if spec.negative_queries is not None:
                    assert len(spec.negative_queries) == len(spec.negative_is_images)
                    assert len(spec.negative_queries) == len(spec.negative_weights)
            if cmd.kind == "set_k":
                assert isinstance(cmd.k, int)
