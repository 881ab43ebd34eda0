package graft.model

/** Typed core for the games surface (SURVEY.md §1.6): compile-time
  * field checks where the schema is static. `revenue` is Option — the
  * float32 product is null whenever owners is (quirk contract,
  * GamesSource.clean). */
final case class Game(
    AppID: Int,
    Name: String,
    release_date: Option[String],
    clean_price: Option[Float],
    avg_owners: Option[Int],
    Developers: Option[String],
    Genres: Option[String],
    revenue: Option[Float])
