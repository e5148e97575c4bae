package graft.sources

import scala.util.Random

/** Deterministic replacement for the reference's MySQL→HTTP emulator
  * machinery (S7–S9, the `User_posting_files` python scripts):
  * generates raw pin /
  * geo / user records with the observed garbage vocabulary
  * (README.md:13-52, :166-173; FIXTURES.md) under a fixed seed.
  *
  * Emits JSON lines (one object per record, exactly the landed Kafka /
  * Kinesis message shape) so tests can exercise the real JSON scan and
  * the real from_json stream deserialization paths.
  */
object EmulatorGenerator {

  val categories: Seq[String] = Seq(
    "mens-fashion", "art", "quotes", "beauty", "vehicles", "travel",
    "christmas", "finance", "diy-and-crafts", "tattoos", "event-planning",
    "home-decor", "education")

  val countries: Seq[String] = Seq(
    "United States", "American Samoa", "Angola", "Albania", "Armenia",
    "Colombia", "Germany", "France", "Japan", "Brazil")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One pin record as a JSON line. Roughly 1 in 8 records carries each
    * garbage value; follower counts mix plain/k/M/edge forms. */
  def pinJson(rng: Random, ind: Long): String = {
    val cat = categories(rng.nextInt(categories.size))
    val title =
      if (rng.nextInt(8) == 0) "No Title Data Available"
      else s"Title $ind about $cat"
    val description =
      if (rng.nextInt(8) == 0)
        (if (rng.nextBoolean()) "No description available Story format"
         else "No description available")
      else s"No shortage of ideas: description $ind" // survives LIKE (prefix differs)
    val poster = if (rng.nextInt(8) == 0) "User Info Error" else s"Poster ${ind % 97}"
    val follower = rng.nextInt(6) match {
      case 0 => "User Info Error"
      case 1 => s"${1 + rng.nextInt(999)}k"
      case 2 => s"${1 + rng.nextInt(99)}M"
      case 3 => s"${1 + rng.nextInt(25)}.5k" // → null under parity cast
      case _ => s"${rng.nextInt(100000)}"
    }
    val tags =
      if (rng.nextInt(8) == 0) "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
      else s"$cat,ideas,inspo"
    val isImgVid = Seq("image", "video", "multi-video(story page format)")(rng.nextInt(3))
    val imageSrc = if (rng.nextInt(8) == 0) "Image src error." else s"https://i.example/$ind.jpg"
    val saveLoc =
      if (rng.nextInt(10) == 0) s"Local save in /data/$cat/thing.jpg" // nulled by %.jpg
      else s"Local save in /data/$cat"
    s"""{"index": $ind, "unique_id": ${quote(f"uuid-$ind%08d")}, """ +
      s""""title": ${quote(title)}, "description": ${quote(description)}, """ +
      s""""poster_name": ${quote(poster)}, "follower_count": ${quote(follower)}, """ +
      s""""tag_list": ${quote(tags)}, "is_image_or_video": ${quote(isImgVid)}, """ +
      s""""image_src": ${quote(imageSrc)}, "downloaded": ${rng.nextInt(2)}, """ +
      s""""save_location": ${quote(saveLoc)}, "category": ${quote(cat)}}"""
  }

  def geoJson(rng: Random, ind: Long): String = {
    val country = countries(rng.nextInt(countries.size))
    val year = 2015 + rng.nextInt(9) // 2015–2023: covers Task 5's 2018–2022 band + outside
    val ts = f"$year-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d " +
      f"${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d"
    val lat = -90 + 180 * rng.nextDouble()
    val lon = -180 + 360 * rng.nextDouble()
    s"""{"ind": $ind, "timestamp": ${quote(ts)}, "latitude": $lat, """ +
      s""""longitude": $lon, "country": ${quote(country)}}"""
  }

  def userJson(rng: Random, ind: Long): String = {
    val age = 12 + rng.nextInt(60) // includes <18 → NULL band
    val year = 2015 + rng.nextInt(3) // 2015–2017, like the reference's coverage
    val dj = f"$year-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d " +
      f"${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d"
    s"""{"ind": $ind, "first_name": ${quote(s"First${ind % 53}")}, """ +
      s""""last_name": ${quote(s"Last${ind % 71}")}, "age": $age, "date_joined": ${quote(dj)}}"""
  }

  /** Generate n records per table. Duplicate `ind`s are guaranteed
    * (FIXTURES.md rule 1): inds are drawn from [0, n*0.8) so ~20% of
    * records share an ind with another record. */
  def generate(n: Int, seed: Long = 42L): (Seq[String], Seq[String], Seq[String]) = {
    val rng = new Random(seed)
    val indSpace = math.max(1, (n * 0.8).toInt)
    val pins = (0 until n).map(_ => pinJson(rng, rng.nextInt(indSpace).toLong))
    val geos = (0 until n).map(_ => geoJson(rng, rng.nextInt(indSpace).toLong))
    val users = (0 until n).map(_ => userJson(rng, rng.nextInt(indSpace).toLong))
    (pins, geos, users)
  }

  /** Write the generated records in the landed-topic layout
    * (`topics/<tbl>/partition=0/NNN.json`) so JsonSource reads them. */
  def writeTopicLayout(baseDir: java.nio.file.Path, n: Int, seed: Long = 42L,
      filesPerTopic: Int = 4): Unit = {
    val (pins, geos, users) = generate(n, seed)
    for ((name, rows) <- Seq("pin" -> pins, "geo" -> geos, "user" -> users)) {
      val dir = baseDir.resolve(s"topics/$name/partition=0")
      java.nio.file.Files.createDirectories(dir)
      rows.grouped(math.max(1, rows.size / filesPerTopic)).zipWithIndex.foreach {
        case (chunk, i) =>
          java.nio.file.Files.writeString(
            dir.resolve(f"$i%03d.json"), chunk.mkString("\n"))
      }
    }
  }
}
