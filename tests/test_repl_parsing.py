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
